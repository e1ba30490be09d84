package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-pinned source readers / sink writers for the formats bundled with
  * Spark (parquet, ORC, CSV, JSON).
  *
  * The reference ingests Avro (`MapBuilder.java:134-159`; the spark-avro
  * datasource is not bundled offline, so Avro ingest is modeled by parquet —
  * SURVEY §2.1 S1). Production posture: ALWAYS pin the schema on text
  * formats — schema inference re-reads the input (a second 100 TB scan) and
  * can silently widen types between runs.
  */
object Formats {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

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
      .format(format).save(path)
}
