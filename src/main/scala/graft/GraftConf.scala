package graft

import org.apache.spark.sql.SparkSession

/** Session settings the engine depends on. Safe to call repeatedly; set at
  * the top of every public query so externally-created sessions (the
  * driver's smoke harness) behave identically to Verify/Bench sessions.
  */
object GraftConf {
  def ensure(spark: SparkSession): SparkSession = {
    // events.parquet carries INT64 TIMESTAMP(NANOS) which Spark 4 refuses to
    // read as a timestamp ([PARQUET_TYPE_ILLEGAL]); read as BIGINT nanos and
    // convert explicitly (timestamp_micros(IntMath.floorDiv(ts, 1000))).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // TIMESTAMP(MICROS, isAdjustedToUTC=false) snapshots: read as
    // TimestampType directly at the SCAN (session zone is pinned UTC below,
    // so the instant is identical to the NTZ reading) instead of inferring
    // TimestampNTZType and paying a per-row NTZ→TZ cast in every consumer —
    // Tables.tsToNanos then reduces to unix_micros (a bit reinterpretation).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }
}
