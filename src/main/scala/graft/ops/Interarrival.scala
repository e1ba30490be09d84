package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inter-arrival-time spectrum: the log₂ histogram of consecutive-event
  * gaps per user — the burstiness/periodicity fingerprint read next to
  * `events_acf` and `events_burstiness` (bot traffic shows sub-second
  * spikes and metronome bands; organic use shows a broad diurnal hump).
  *
  * Exactness contract: gaps are exact integer MICROSECONDS (`ts DIV 1000`
  * of the nanos column ≡ DuckDB `epoch_us(ts)` — the stats_linreg
  * equivalence), bucketed by integer bit width
  * `length(bin(gap_us + 1)) − 1` (the `bin_width` canary probe; +1 keeps
  * the zero gap in bucket 0), so every row is engine-exact. Ordering ties
  * (same user, same ts) break on event_id in both engines.
  *
  * Scale shape: ONE window partitioned by user_id (the axis that grows
  * with the corpus — never a global window; the user-axis replica is the
  * stress fixture), then a ≤64-bucket hash aggregate. Per-user state is
  * one lag value; nothing corpus-global crosses the driver.
  */
object Interarrival {

  def histogram(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val us = call_function("div", col("ts"), lit(1000L))
    val gaps = events.select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap_us", us - lag(us, 1).over(w))
      .filter(col("gap_us").isNotNull)
    gaps
      .select((length(bin(col("gap_us") + 1)) - 1).cast("long").as("bucket"),
        col("gap_us"), col("user_id"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap_us")).as("min_gap_us"), max(col("gap_us")).as("max_gap_us"),
        count_distinct(col("user_id")).as("n_users"))
      .orderBy("bucket")
  }

  /** DuckDB mirror of [[histogram]], term-for-term. */
  def sqlHistogram: String =
    """WITH g AS (SELECT user_id,
      |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      |  FROM events)
      |SELECT (length(bin(gap_us + 1)) - 1)::BIGINT AS bucket,
      |  count(*)::BIGINT AS n_gaps,
      |  min(gap_us)::BIGINT AS min_gap_us, max(gap_us)::BIGINT AS max_gap_us,
      |  count(DISTINCT user_id)::BIGINT AS n_users
      |FROM g WHERE gap_us IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin
}
