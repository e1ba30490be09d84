package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * At production scale the same API points at an HDFS/S3 snapshot directory
  * (reference: `MapBuilder.java:134-159` reads an Avro snapshot glob with
  * `format("com.databricks.spark.avro")`). Round 2 makes the format a SEAM:
  * every table resolves through the session conf `graft.tables.format`
  * (default `parquet`), so a deployment points the same queries at ORC or
  * Avro — Spark 4 bundles the avro datasource inside spark-sql itself, and
  * `FormatsSpec` proves `scan_project` runs unchanged over an Avro snapshot
  * — without touching a single query. Tables are expected at
  * `<sfDir>/<name>.<format>`.
  *
  * Self-describing formats only: CSV/JSON need a pinned schema (inference
  * would re-scan 100 TB and can silently widen types between runs) — read
  * those through [[graft.io.Formats]] with an explicit schema.
  */
object Tables {

  /** Session conf key selecting the table source format. */
  val FormatKey = "graft.tables.format"

  /** `events.ts` contract: BIGINT epoch NANOS. Snapshots have shipped it
    * both as INT64 TIMESTAMP(NANOS) (read as BIGINT nanos via the legacy
    * flag in [[GraftConf]]) and as TIMESTAMP(MICROS) (read as a timestamp
    * type) — normalize here, once, so every query and oracle downstream
    * keeps the nanos-long contract regardless of the snapshot's physical
    * type. Naive timestamps are interpreted in the session zone (pinned
    * UTC by [[GraftConf]]), matching DuckDB's `epoch_us` on the same file.
    */
  private def tsToNanos(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      // INT64 TIMESTAMP(NANOS) under nanosAsLong: already epoch nanos. A
      // plain un-annotated INT64 lands here too — nanos IS its contract
      // (TESTDATA.md); an unannotated-micros snapshot must be re-annotated
      // upstream, it is indistinguishable from nanos by schema alone.
      case LongType => df
      // TIMESTAMP(MICROS): with inferTimestampNTZ disabled the scan already
      // yields TimestampType, so this is a reinterpretation + multiply, not
      // a zone cast. The NTZ arm survives for externally-created sessions
      // that scanned before GraftConf pinned the reader.
      case TimestampType => df.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case TimestampNTZType => df.withColumn("ts",
        unix_micros(col("ts").cast(TimestampType)) * 1000L)
      // Anything else (string, double, int32 …) is a corrupt snapshot —
      // fail fast instead of force-casting into a silently wrong scale.
      case other => throw new IllegalArgumentException(
        s"events.ts: unsupported type $other - expected INT64 nanos or TIMESTAMP")
    }
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    GraftConf.ensure(spark)
    val fmt = spark.conf.get(FormatKey, "parquet")
    require(fmt != "csv" && fmt != "json",
      s"text formats need a pinned schema - use graft.io.Formats.readCsv/readJson")
    spark.read.format(graft.io.Formats.provider(fmt)).load(s"$sfDir/$name.$fmt")
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def events(spark: SparkSession, sfDir: String): DataFrame =
    tsToNanos(table(spark, sfDir, "events"))
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
