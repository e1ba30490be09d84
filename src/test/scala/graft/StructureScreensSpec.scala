package graft

import graft.ops.{Acf, RichClub}

/** Hand fixtures for the two bounded-grid structure screens added in
  * round 9: rich-club density and hourly autocorrelation.
  */
class StructureScreensSpec extends SparkSpec {
  import spark.implicits._

  test("richClub: star + one hub-hub edge forms a complete k=1 club; tiny clubs read NULL") {
    // degrees: 1->3, 2->2, 3->2, 4->1
    val edges = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L).toDF("a", "b")
    val rows = RichClub.richClub(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    // k=1: members {1,2,3}, all 3 possible edges present -> phi = 1e6
    assert(rows(1L) == ((3L, 3L, 1000000L)), rows.toString)
    // k=2: only node 1 qualifies -> phi undefined
    assert(rows(2L) == ((1L, 0L, -1L)), rows.toString)
    assert(rows(32L) == ((0L, 0L, -1L)), "empty thresholds still emit grid rows")
  }

  test("acf: a linear ramp is perfectly autocorrelated; a constant series pins 0") {
    val hourly = (
      (0L to 5L).map(h => ("ramp", h, h + 1)) ++
      (0L to 5L).map(h => ("flat", h, 5L))
    ).toDF("event_type", "hr", "c")
    val rows = Acf.acf(hourly).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(rows(("ramp", 1L)) == ((5L, 1.0)), rows.toString)
    assert(rows(("ramp", 3L)) == ((3L, 1.0)), rows.toString)
    assert(rows(("flat", 1L)) == ((5L, 0.0)), "zero variance pins 0")
    // lag 24 exceeds the 6-hour span: no observed pair, no row
    assert(!rows.contains(("ramp", 24L)))
  }

  test("acf: a period-2 alternating series reads -1 at lag 1 and +1 at lag 2") {
    val hourly = (0L to 7L).map(h => ("alt", h, if (h % 2 == 0) 10L else 2L))
      .toDF("event_type", "hr", "c")
    val rows = Acf.acf(hourly).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(rows(1L) == -1.0 && rows(2L) == 1.0, rows.toString)
  }

  test("events_burstiness: matches the driver-side recompute; >= 0 everywhere") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("events_burstiness")(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // driver-side recompute of D_ppm from the same rollup
    val h = Tables.events(spark, d)
      .select(org.apache.spark.sql.functions.col("event_type"),
        graft.expr.IntMath.floorDiv(
          org.apache.spark.sql.functions.col("ts"), 3600L * 1000000000L).as("hr"))
      .groupBy("event_type", "hr")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(2))
    val byType = h.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    byType.foreach { case (t, cs) =>
      val n = BigInt(cs.length); val s = BigInt(cs.sum)
      val q = cs.map(c => BigInt(c) * c).sum
      val want =
        if (n < 2 || s == 0) BigInt(0)
        else ((n * q - s * s) * 1000000) / ((n - 1) * s)
      assert(got(t) == ((cs.length.toLong, want.toLong)), s"$t: ${got(t)} vs $want")
      assert(got(t)._2 >= 0L)
    }
  }

  test("events_pareto: shares monotone in pct, bounded, and above uniform") {
    val rows = SparkEntry.queries("events_pareto")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(1L, 5L, 10L, 50L))
    val shares = rows.map(_._4)
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b },
      s"cumulative shares must not decrease: ${shares.toSeq}")
    assert(shares.forall(s => s >= 0L && s <= 1000000L))
    // the top p% (most-active users) always hold at least a uniform share
    rows.foreach { case (p, _, _, s) =>
      assert(s >= p * 10000L, s"top $p% below uniform: $s ppm")
    }
  }
}
