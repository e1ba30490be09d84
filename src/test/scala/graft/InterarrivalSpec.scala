package graft

import graft.ops.{Interarrival, Stats}

/** ops.Interarrival histogram + Stats.medianTypes on hand-computed data. */
class InterarrivalSpec extends SparkSpec {
  import spark.implicits._

  test("interarrival: per-user gaps in exact micro-seconds, log2 buckets") {
    // user 1: ts 0 ns, 1000 ns (gap 1 µs), 4_000_000 ns (gap 3999 µs);
    // user 2: one event → no gap; user 3: two events at the SAME ts
    // (tie-broken by event_id → gap 0 → bucket 0)
    val events = Seq(
      (1L, 0L, 10L), (1L, 1000L, 11L), (1L, 4000000L, 12L),
      (2L, 5000L, 20L),
      (3L, 7000L, 30L), (3L, 7000L, 31L))
      .toDF("user_id", "ts", "event_id")
    val got = Interarrival.histogram(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // gap 0 → bin(1)='1' → bucket 0; gap 1 → bin(2)='10' → bucket 1;
    // gap 3999 → bin(4000) is 12 chars → bucket 11
    assert(got == Seq(
      (0L, 1L, 0L, 0L, 1L),
      (1L, 1L, 1L, 1L, 1L),
      (11L, 1L, 3999L, 3999L, 1L)), s"got $got")
  }

  test("dau/wau/stickiness: trailing-7-day membership on a hand calendar") {
    val day = graft.ops.Engagement.NanosPerDay
    // u1 active days 0 and 8; u2 active days 0 and 5
    val events = Seq(
      (1L, 1000L), (1L, 8 * day + 5),
      (2L, 7L), (2L, 5 * day + 1))
      .toDF("user_id", "ts")
    val got = graft.ops.Engagement.dauWau(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // day 0: DAU {u1,u2}, WAU {u1,u2} → 1e6; day 5: DAU {u2}, WAU {u1@0..6,
    // u2} → 500000; day 8: DAU {u1}, WAU {u1, u2@5..11} → 500000
    assert(got == Seq(
      (0L, 2L, 2L, 1000000L),
      (5L, 1L, 2L, 500000L),
      (8L, 1L, 2L, 500000L)), s"got $got")
  }

  test("levene (brown-forsythe): F over |2c - median_x2| on hand data") {
    // a: cents {100, 300} → m2 = 400, z = {200, 200};
    // b: {100, 100, 700} → m2 = 200, z = {0, 0, 1200}.
    // terms: 400²DIV2 = 80000, 1200²DIV3 = 480000; ssb = 560000 −
    // 1600²DIV5 = 48000; ssw = 1520000 − 560000 = 960000 →
    // F = 48000·3 / 960000 = 0.15
    val events = Seq(("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 1.0), ("b", 7.0))
      .toDF("event_type", "value")
    val r = graft.ops.Stats.leveneTypes(events).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4)) == ((5L, 2L, 48000L, 960000L, 0.15)), s"got $r")
  }

  test("mann-whitney: tie-averaged pair ranks, exact 2U, tie-corrected z") {
    // a = {1, 2} cents·100, b = {2, 3}: pooled 2r̄ = (2, 5, 8) →
    // 2R_a = 2 + 5 = 7, 2U_a = 7 − 2·3 = 1; ties Σ(t³−t) = 6, N = 4 →
    // var = 4/12·(5 − 6/12) = 1.5, z = (1 − 4)/(2√1.5) = −1.224745
    val events = Seq(("a", 0.01), ("a", 0.02), ("b", 0.02), ("b", 0.03))
      .toDF("event_type", "value")
    val got = graft.ops.Stats.mannWhitneyPairs(events)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got == Seq(("a", "b", 2L, 2L, 1L, -1.224745)), s"got $got")
  }

  test("mann-whitney: all-tied pair pins z = 0; guard raises past the bound") {
    val tied = Seq(("a", 0.05), ("a", 0.05), ("b", 0.05)).toDF("event_type", "value")
    val r = graft.ops.Stats.mannWhitneyPairs(tied).collect()(0)
    assert(r.getDouble(5) == 0.0)
    val e = intercept[Throwable] {
      graft.ops.Stats.mannWhitneyPairs(tied, maxN = 2).collect()
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(t =>
      String.valueOf(t.getMessage).contains("stats_mannwhitney")))
  }

  test("exact median: 2·median in whole cents from order statistics") {
    // type a: cents [1, 2, 2, 5] → lo = hi = 2 → 4; type b: [10, 20, 30]
    // → 40; type c: [7, 9] → lo 7, hi 9 → 16 (the even-n split case)
    val events = Seq(
      ("a", 0.01), ("a", 0.02), ("a", 0.02), ("a", 0.05),
      ("b", 0.10), ("b", 0.20), ("b", 0.30),
      ("c", 0.07), ("c", 0.09)).toDF("event_type", "value")
    val got = Stats.medianTypes(events)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", 4L, 4L), ("b", 3L, 40L), ("c", 2L, 16L)), s"got $got")
  }
}
