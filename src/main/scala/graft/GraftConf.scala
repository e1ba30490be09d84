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
    // Part of the loud-overflow contract (Stats.MaxCentMass class): with
    // ANSI off, a DECIMAL(38,0) moment product past the headroom silently
    // NULLs where DuckDB HUGEINT holds or errors — the silent cross-engine
    // divergence round-9 verdict task #5 closes. Spark 4 defaults ANSI on;
    // pin it so a user session with ansi=off can't reopen the hole.
    spark.conf.set("spark.sql.ansi.enabled", "true")
    spark
  }
}
