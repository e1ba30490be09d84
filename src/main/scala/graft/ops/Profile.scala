package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling — the ANALYZE/data-quality report an ingest
  * pipeline runs before trusting a new snapshot: per column, row/null/
  * distinct counts and min/max rendered as strings (BIGINT/INTEGER/VARCHAR
  * columns render identically across engines; doubles and timestamps are
  * excluded from the contract because their string forms are
  * engine-specific).
  *
  * Shape: ONE scan computes every metric — the per-column aggregates ride
  * a single `agg` (Spark plans the multiple DISTINCT aggregates via
  * Expand: |cols| row-copies, each feeding one distinct-group — the
  * textbook profiling plan, all map-side partial), and the wide 1-row
  * result unpivots to rows with `stack` (driver-free: stack is a
  * generator, not a collect). At 100 TB the cost is the |cols|× Expand of
  * one scan, shuffle-bounded by the distinct-count states — the same bill
  * ANALYZE TABLE pays; nothing is quadratic and no row leaves the
  * executors until the |cols|-row report.
  */
object Profile {

  /** Per-column profile rows: (col_name, n_rows, n_null, n_nonnull,
    * n_distinct, min_s, max_s). `n_distinct` is exact (profiling feeds
    * dedup/layout decisions; the approximate variant is `agg_approx_distinct`'s
    * HLL family).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"nn_$c"),
        count_distinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    } :+ count(lit(1)).as("n_rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c => s"'$c', nn_$c, nd_$c, mn_$c, mx_$c").mkString(", ")
    wide
      .selectExpr("n_rows",
        s"stack(${cols.length}, $stackArgs) AS (col_name, n_nonnull, n_distinct, min_s, max_s)")
      .select(col("col_name"), col("n_rows"),
        (col("n_rows") - col("n_nonnull")).as("n_null"),
        col("n_nonnull"), col("n_distinct"), col("min_s"), col("max_s"))
  }

  /** DuckDB mirror of [[profile]] over a named table. */
  def sqlProfile(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS col_name, count(*)::BIGINT AS n_rows,
         |  (count(*) - count($c))::BIGINT AS n_null,
         |  count($c)::BIGINT AS n_nonnull,
         |  count(DISTINCT $c)::BIGINT AS n_distinct,
         |  min($c)::VARCHAR AS min_s, max($c)::VARCHAR AS max_s
         |FROM $table""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
}
