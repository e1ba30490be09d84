package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Edge-case contracts for the event-analytics query keys (retention,
  * funnel, state intervals, anomaly) that the uniform fixture cannot pin:
  * out-of-order funnel stages must NOT count, interval runs must split on
  * state change only, retention offsets must be cohort-relative.
  */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  /** Events in the fixture's raw shape: ts as BIGINT nanoseconds. */
  private def ev(rows: (Long, Long, String, Long, Double)*): DataFrame =
    rows.toDF("event_id", "user_id", "event_type", "ts", "value")

  private def writeDir(df: DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("ev").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def run(key: String, df: DataFrame): Array[org.apache.spark.sql.Row] =
    SparkEntry.queries(key)(spark, writeDir(df)).collect()

  test("events_funnel: a view BEFORE the user's signup does not convert") {
    val us = 1000L // ns per us step
    val rows = ev(
      (1L, 1L, "view", 5L * us, 1.0),    // pre-signup view: must not count
      (2L, 1L, "signup", 10L * us, 1.0),
      (3L, 2L, "signup", 10L * us, 1.0),
      (4L, 2L, "view", 20L * us, 1.0),
      (5L, 2L, "click", 30L * us, 1.0))
    val out = run("events_funnel", rows).map(r =>
      (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1, "signup", 2L), (2, "view", 1L),
      (3, "click", 1L), (4, "purchase", 0L)))
  }

  test("events_funnel: same-timestamp stage counts (>= boundary)") {
    val out = run("events_funnel", ev(
      (1L, 1L, "signup", 1000L, 1.0),
      (2L, 1L, "view", 1000L, 1.0)))
      .map(r => (r.getInt(0), r.getLong(2)))
    assert(out.toSeq == Seq((1, 1L), (2, 1L), (3, 0L), (4, 0L)))
  }

  test("state_intervals: runs split on state change, not on time gaps") {
    val out = run("state_intervals", ev(
      (1L, 1L, "view", 1000L, 1.0),
      (2L, 1L, "view", 999999000L, 1.0), // huge gap, same state: same run
      (3L, 1L, "click", 1000000000L, 1.0),
      (4L, 1L, "view", 1000001000L, 1.0))) // back to view: NEW run
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("view", 1L, 999999L, 2L),
      ("click", 1000000L, 1000000L, 1L),
      ("view", 1000001L, 1000001L, 1L)))
  }

  test("events_retention: offsets are cohort-relative and distinct per day") {
    val day = 86400L * 1000000000L
    val out = run("events_retention", ev(
      (1L, 1L, "view", 0L, 1.0),          // user 1 cohort day 0
      (2L, 1L, "view", 1L, 1.0),          // same day: distinct-collapsed
      (3L, 1L, "view", 2 * day, 1.0),     // day 2 -> offset 2
      (4L, 2L, "view", day, 1.0),         // user 2 cohort day 1
      (5L, 2L, "view", 2 * day, 1.0)))    // day 2 -> offset 1
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 0L, 1L), (0L, 2L, 1L), (1L, 0L, 1L), (1L, 1L, 1L)))
  }

  test("events_anomaly: only the planted outlier is flagged") {
    // 200 calm rows (value 10 or 12) + one wild row per type
    val calm = (1L to 200L).map(i =>
      (i, i % 7, "view", i * 1000L, if (i % 2 == 0) 10.0 else 12.0))
    val wild = Seq((900L, 3L, "view", 901000L, 500.0))
    val out = run("events_anomaly", ev(calm ++ wild: _*))
    assert(out.length == 1 && out.head.getLong(0) == 900L && out.head.getDouble(3) > 3.0)
  }

  test("events_attribution: linear credit splits exactly, last touch unique, no cross-user bleed") {
    val h = 3600L * 1000000000L // ns per hour
    val out = run("events_attribution", ev(
      (1L, 1L, "click", 10 * h, 1.0),
      (2L, 1L, "click", 20 * h, 1.0),
      (3L, 1L, "purchase", 24 * h, 10.00), // window [0h,24h): clicks 1,2
      (4L, 1L, "purchase", 30 * h, 7.77),  // window [6h,30h): clicks 1,2
      (5L, 2L, "click", 1 * h, 1.0),       // other user, outside any window
      (6L, 2L, "purchase", 30 * h, 5.0)))  // [6h,30h): no same-user clicks
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 1000 div 2 = 500 and 777 div 2 = 388 per click; click 2 (latest) is
    // the last touch of BOTH purchases; user 2's click never attributes
    assert(out.toSeq == Seq((1L, 2L, 888L, 0L), (2L, 2L, 888L, 2L)), s"got ${out.toSeq}")
  }

  test("events_active_users: WAU covers the 7-day lookback; only active days report") {
    val day = 86400L * 1000000000L
    val out = run("events_active_users", ev(
      (1L, 1L, "view", 0L, 1.0),
      (2L, 2L, "view", 1L, 1.0),          // day 0: users {1,2}
      (3L, 1L, "view", 3 * day, 1.0)))    // day 3: user {1}
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // WAU(0) = users in days [-6,0] = 2; WAU(3) = users in [-3,3] = 2;
    // days 1,2 have no activity -> no rows
    assert(out.toSeq == Seq((0L, 2L, 2L), (3L, 1L, 2L)), s"got ${out.toSeq}")
  }

  test("events_churn: retained/churned/new partition the actives; last week right-censored") {
    val wk = 7L * 86400L * 1000000000L
    val out = run("events_churn", ev(
      (1L, 1L, "view", 0L, 1.0),          // u1 wk0
      (2L, 1L, "view", wk, 1.0),          // u1 wk1 (retained)
      (3L, 2L, "view", 1L, 1.0),          // u2 wk0 only (churns after wk0)
      (4L, 3L, "view", wk + 1L, 1.0)))    // u3 wk1 only (new in wk1)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (-1L, 0L, 0L, 0L, 2L),  // transition row INTO wk0: both users are new
      (0L, 2L, 1L, 1L, 1L),   // u1 retained, u2 churned, u3 arrives next
      (1L, 2L, 0L, 2L, 0L)),  // right-censored: no wk2 observed
      s"got ${out.toSeq}")
  }

  test("embedding_gram: hand-computed gram and covariance numerators") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("emb").toString
    // dims 2..63 are zero-padded (the key derives dim from Quantizer.Dim)
    val pad = Seq.fill(62)(0.0f)
    Seq((1L, Seq(1.0f, 2.0f) ++ pad, 0), (2L, Seq(3.0f, 4.0f) ++ pad, 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("embedding_gram")(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // quantized rows: (10000, 20000), (30000, 40000)
    assert(out((0L, 0L)) == ((2L, 1000000000L, 400000000L)))
    assert(out((0L, 1L)) == ((2L, 1400000000L, 400000000L)))
    assert(out((1L, 1L)) == ((2L, 2000000000L, 400000000L)))
    assert(out((0L, 2L)) == ((2L, 0L, 0L)), "zero-padded dims: zero gram/cov")
    assert(out.size == 64 * 65 / 2, "full upper triangle")
  }

  test("events_interpolate: planted gap replays the exact integer-weighted mean") {
    // type A: observed at hours 0 (1000 cents total) and 3 (4000 cents);
    // hours 1-2 are gaps. type B: observed only at hour 1 (unambiguous
    // edges on both sides). Hour axis is the union span 0..3.
    val hr = 3600L * 1000000000L
    val d = writeDir(ev(
      (0L, 1L, "A", 0L * hr, 10.00),
      (1L, 1L, "A", 3L * hr + 60L * 1000000000L, 40.00),
      (2L, 1L, "B", 1L * hr, 7.50)))
    val rows = SparkEntry.queries("events_interpolate")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else java.lang.Long.valueOf(r.getLong(2)),
        r.getString(3)))
    assert(rows.length == 8, "2 types x 4 hours")
    val a = rows.filter(_._1 == "A").sortBy(_._2)
    assert(a.map(_._4).toSeq == Seq("obs", "interp", "interp", "obs"))
    assert(a(0)._3 == 1000L && a(3)._3 == 4000L)
    // linear: v(h) = (1000*(3-h) + 4000*(h-0)) div 3
    assert(a(1)._3 == (1000L * 2 + 4000L * 1) / 3)
    assert(a(2)._3 == (1000L * 1 + 4000L * 2) / 3)
    val b = rows.filter(_._1 == "B").sortBy(_._2)
    assert(b.map(_._4).toSeq == Seq("edge", "obs", "edge", "edge"))
    assert(b(1)._3 == 750L && b(0)._3 == null && b(3)._3 == null)
  }

  test("events_ewma: fold replays the hand-computed Holt recurrence in hour order") {
    val hr = 3600L * 1000000000L
    // type A: hourly counts 10, 20, 6 (hours 0, 1, 2) -> fold over ppm:
    //   seed (10e6, 0)
    //   +20e6: l=(10e6+20e6)/2=15e6, t=(0+(15e6-10e6))/2=2.5e6
    //   + 6e6: l=(15e6+6e6) div 2=10.5e6, t=(2.5e6+(10.5e6-15e6)) div 2=-1e6
    // type B: one hour -> level=count*1e6, trend=0
    val rows = (1L to 10L).map(i => (i, i, "A", 0L * hr + i, 1.0)) ++
      (11L to 30L).map(i => (i, i, "A", 1L * hr + i, 1.0)) ++
      (31L to 36L).map(i => (i, i, "A", 2L * hr + i, 1.0)) ++
      Seq((40L, 40L, "B", 5L * hr + 7L, 1.0))
    val out = run("events_ewma", ev(rows: _*))
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("A", 3L, 10500000L, -1000000L, 9500000L),
      ("B", 1L, 1000000L, 0L, 1000000L)))
  }

  test("events_ewma_backtest: hand-computed one-step errors; naive wins on white noise") {
    val hr = 3600L * 1000000000L
    // type A counts 10, 20, 6:
    //   step to 20e6: holt err |10e6+0-20e6|=10e6; naive err |10e6-20e6|=10e6
    //     -> l=15e6, t=2.5e6, p=20e6
    //   step to  6e6: holt err |15e6+2.5e6-6e6|=11.5e6; naive |20e6-6e6|=14e6
    // mae_holt=(10e6+11.5e6)/2=10.75e6; mae_naive=(10e6+14e6)/2=12e6 -> holt wins
    val rows = (1L to 10L).map(i => (i, i, "A", 0L * hr + i, 1.0)) ++
      (11L to 30L).map(i => (i, i, "A", 1L * hr + i, 1.0)) ++
      (31L to 36L).map(i => (i, i, "A", 2L * hr + i, 1.0))
    val out = run("events_ewma_backtest", ev(rows: _*)).head
    assert(out.getLong(1) == 3L)
    assert(out.getLong(2) == 10750000L && out.getLong(3) == 12000000L)
    assert(out.getBoolean(4))
    // single-hour type: both MAEs pin to 0 (no steps), no div-by-zero
    val one = run("events_ewma_backtest", ev((1L, 1L, "B", 7L, 1.0))).head
    assert(one.getLong(2) == 0L && one.getLong(3) == 0L && !one.getBoolean(4))
  }

  test("events_ewma: constant series converges to level=count, trend=0") {
    val hr = 3600L * 1000000000L
    val rows = for (h <- 0L to 9L; i <- 1L to 4L)
      yield (h * 10 + i, h * 10 + i, "C", h * hr + i, 1.0)
    val out = run("events_ewma", ev(rows: _*)).head
    assert(out.getLong(1) == 10L)            // n_hours
    assert(out.getLong(2) == 4000000L)       // level locks to 4e6
    assert(out.getLong(3) == 0L)             // trend decays to 0
    assert(out.getLong(4) == 4000000L)
  }
}
