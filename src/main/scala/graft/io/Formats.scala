package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-pinned source readers / sink writers for the formats bundled with
  * Spark (parquet, ORC, Avro, CSV, JSON).
  *
  * Avro is the reference's actual ingest format (`MapBuilder.java:134-159`,
  * `format("com.databricks.spark.avro")`); Spark 4 bundles the avro
  * datasource in spark-sql itself (`org.apache.spark.sql.avro`), so the
  * same `Tables` seam covers it — `FormatsSpec` proves the round trip and
  * runs a driver query over an Avro copy of the tables. Production posture:
  * ALWAYS pin the schema on text formats — schema inference re-reads the
  * input (a second 100 TB scan) and can silently widen types between runs.
  */
object Formats {

  /** Spark 4 ships the full avro datasource (serializer, deserializer,
    * `AvroFileFormat`) inside spark-sql itself, but without the
    * `DataSourceRegister` service entry, so the short name `avro` throws
    * "external data source module" — the fully-qualified provider class
    * resolves fine. Map the short name here; everything else passes through.
    */
  val AvroProvider = "org.apache.spark.sql.avro.AvroFileFormat"

  def provider(format: String): String =
    if (format == "avro") AvroProvider else format

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def readAvro(spark: SparkSession, path: String): DataFrame =
    spark.read.format(AvroProvider).load(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
      .csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def write(df: DataFrame, path: String, format: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
      .format(provider(format)).save(path)
}
