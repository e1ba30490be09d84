package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Autocorrelation function of the per-type hourly event-count series at
  * a bounded lag grid — the seasonality DIAGNOSTIC read before trusting
  * `events_seasonal` / `events_ewma`: a spike at lag 24 is the
  * hour-of-day cycle; fast decay says smoothing alone suffices.
  *
  * Semantics: Pearson correlation of (count@hr, count@hr+lag) over every
  * OBSERVED hour pair (hours with zero events carry no row — the sparse
  * rollup convention events_gapfill exists to undo; documenting observed
  * pairs keeps the statistic corpus-derived, not calendar-derived).
  *
  * Exactness contract (stats_corr): the five moments accumulate exactly
  * in DECIMAL(38,0) over integer counts; the tail is the correctly-
  * rounded IEEE chain `(n·sxy − sx·sy) / (sqrt(n·sxx − sx²) ·
  * sqrt(n·syy − sy²))` — casts, ·, sqrt, / are all correctly rounded, no
  * libm transcendental — so round(r, 6) is bit-equal across engines.
  * Degenerate zero-variance sides pin 0. Fewer than 2 pairs pins 0.
  *
  * Scale shape: ONE corpus-sized hourly rollup (map-side combinable),
  * then a |lags|-way broadcast-grid self-join of the calendar-bounded
  * hourly frame and a (type × lag)-bounded moment aggregate. Nothing
  * after the rollup scales with the corpus.
  */
object Acf {

  /** Default lag grid: short-range decay + the half-day/day cycle. */
  val Lags: Seq[Long] = Seq(1L, 2L, 3L, 6L, 12L, 24L)

  /** `hourly` must be (event_type, hr, c) — the per-type hourly rollup. */
  def acf(hourly: DataFrame, lags: Seq[Long] = Lags): DataFrame = {
    val spark = hourly.sparkSession
    import spark.implicits._
    val h = hourly.localCheckpoint() // both sides of the lag self-join
    val lf = broadcast(lags.toDF("lag"))
    val pairs = h.crossJoin(lf)
      .select(col("event_type"), col("lag"), (col("hr") + col("lag")).as("thr"),
        col("c").cast("decimal(38,0)").as("x"))
      .join(h.select(col("event_type"), col("hr").as("thr"),
        col("c").cast("decimal(38,0)").as("y")), Seq("event_type", "thr"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val den = sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
      sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))
    pairs.groupBy("event_type", "lag")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("event_type"), col("lag"), col("n").cast("long").as("n_pairs"),
        when(col("n") < 2 || den === 0.0, 0.0)
          .otherwise(round(num / den, 6)).as("acf_r"))
      .orderBy("event_type", "lag")
  }

  /** DuckDB mirror of [[acf]]; expects a CTE `h(event_type, hr, c)` with
    * the hourly rollup in scope.
    */
  def sqlAcf(lags: Seq[Long] = Lags): String = {
    val grid = lags.map(l => s"($l)").mkString(", ")
    s"""lf AS (SELECT lag FROM (VALUES $grid) t(lag)),
       |pr AS (SELECT a.event_type, lf.lag,
       |         a.c::HUGEINT AS x, b.c::HUGEINT AS y
       |       FROM h a CROSS JOIN lf
       |       JOIN h b ON b.event_type = a.event_type
       |                AND b.hr = a.hr + lf.lag),
       |ag AS (SELECT event_type, lag, count(*)::HUGEINT AS n,
       |         sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
       |         sum(y * y) AS syy, sum(x * y) AS sxy
       |       FROM pr GROUP BY 1, 2)
       |SELECT event_type, lag, n::BIGINT AS n_pairs,
       |  CASE WHEN n < 2 OR sqrt((n * sxx - sx * sx)::DOUBLE)
       |              * sqrt((n * syy - sy * sy)::DOUBLE) = 0
       |       THEN 0.0
       |       ELSE round((n * sxy - sx * sy)::DOUBLE
       |              / (sqrt((n * sxx - sx * sx)::DOUBLE)
       |                 * sqrt((n * syy - sy * sy)::DOUBLE)), 6) END AS acf_r
       |FROM ag ORDER BY 1, 2""".stripMargin
  }
}
