package graft

import org.apache.spark.sql.functions.lit
import graft.ops.Stats

class LinregSpec extends SparkSpec {
  import spark.implicits._

  test("linreg: recovers exact synthetic lines per group") {
    // Group "lin": y_cents = 200x + 500 on hours x = 0..3 (ts nanos at
    // exact hour boundaries after 2024-01-01); group "flat": constant
    // 100 cents. Both recoverable exactly, so round(…, 6) is the identity.
    val hour0 = 1704067200L
    val rows =
      (0 to 3).map { x =>
        ((hour0 + x * 3600L) * 1000000000L, "lin", (200 * x + 500) / 100.0)
      } ++ (0 to 2).map { x =>
        ((hour0 + x * 3600L) * 1000000000L, "flat", 1.0)
      }
    val df = rows.toDF("ts", "event_type", "value")
    val out = Stats.linreg(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(out("lin") == ((4L, 200.0, 500.0)))
    assert(out("flat") == ((3L, 0.0, 100.0)))
  }

  test("anovaTypes: hand-checkable F on two balanced groups; equal means read F=0") {
    // A = {0, 2} dollars (0, 200 cents), B = {4, 6} (400, 600): group
    // means 100/500, grand 300 -> SSB = 2·200² + 2·200² = 160000 cents²,
    // SSW = 4·100² = 40000 -> F = (160000/1) / (40000/2) = 8 exactly.
    val df = Seq(("A", 0.0), ("A", 2.0), ("B", 4.0), ("B", 6.0))
      .toDF("event_type", "value")
    val r = Stats.anovaTypes(df).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 160000L, s"ssb_c2 ${r.getLong(2)}")
    assert(r.getLong(3) == 40000L, s"ssw_c2 ${r.getLong(3)}")
    assert(r.getDouble(4) == 8.0, s"F ${r.getDouble(4)}")

    // identical group means: SSB truncation may leave a few negative
    // µunits — the clamp pins 0, and F reads 0
    val eq = Seq(("A", 1.0), ("A", 3.0), ("B", 1.0), ("B", 3.0))
      .toDF("event_type", "value")
    val r2 = Stats.anovaTypes(eq).collect().head
    assert(r2.getLong(2) == 0L && r2.getDouble(4) == 0.0)

    // degenerate: one group -> F defined as 0, never a division blowup
    val one = Seq(("A", 1.0), ("A", 5.0)).toDF("event_type", "value")
    assert(Stats.anovaTypes(one).collect().head.getDouble(4) == 0.0)
  }

  test("kruskalTypes: hand-checkable H; symmetric ties read 0; all-tied guard") {
    // A = {1, 2}, B = {3, 4} dollars, no ties: ranks 1..4, R_A = 3,
    // R_B = 7 -> H = 12/(4·5)·(9/2 + 49/2) − 3·5 = 17.4 − 15 = 2.4.
    val df = Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0))
      .toDF("event_type", "value")
    val r = Stats.kruskalTypes(df).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 2.4, s"H ${r.getDouble(2)}")

    // identical rank distributions across groups: H = 0 exactly, and the
    // tie correction (two pairs of ties) must not blow the denominator
    val sym = Seq(("A", 1.0), ("A", 2.0), ("B", 1.0), ("B", 2.0))
      .toDF("event_type", "value")
    assert(Stats.kruskalTypes(sym).collect().head.getDouble(2) == 0.0)

    // every value identical: N³−N == Σ(t³−t) -> denominator 0 -> pinned 0
    val tied = Seq(("A", 5.0), ("A", 5.0), ("B", 5.0))
      .toDF("event_type", "value")
    assert(Stats.kruskalTypes(tied).collect().head.getDouble(2) == 0.0)
  }

  test("linreg: mid-hour timestamps floor to their hour bucket") {
    // Two points in hours 0 and 1, each 30 min past the boundary — x must
    // floor to 0 and 1, giving slope = y1 - y0 exactly.
    val hour0ns = 1704067200L * 1000000000L
    val df = Seq(
      (hour0ns + 1800L * 1000000000L, "t", 3.00),
      (hour0ns + 5400L * 1000000000L, "t", 7.50)
    ).toDF("ts", "event_type", "value")
    val r = Stats.linreg(df).collect().head
    assert(r.getDouble(2) == 450.0 && r.getDouble(3) == 300.0)
  }

  test("streaming linregRaw (complete mode) == batch linreg on the same data") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val hour0ns = 1704067200L * 1000000000L
    val rows = (0 until 60).map { i =>
      (hour0ns + (i % 9).toLong * 3600L * 1000000000L,
        if (i % 2 == 0) "a" else "b", (i % 11) * 0.73)
    }
    val in = MemoryStream[(Long, String, Double)]
    val q = Stats.linregRaw(in.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("linreg_stream")
      .outputMode("complete").start()
    try {
      in.addData(rows.take(25): _*); q.processAllAvailable()
      in.addData(rows.drop(25): _*); q.processAllAvailable()
      val streamed = spark.table("linreg_stream").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
        .toMap
      val batch = Stats.linreg(rows.toDF("ts", "event_type", "value")).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
        .toMap
      assert(streamed == batch)
      assert(streamed.keySet == Set("a", "b"))
    } finally q.stop()
  }

  test("chisq: identity form captures empty-cell mass exactly") {
    // A: hod0 x3, hod1 x1; B: hod0 x1, (B, hod1) EMPTY. Full Pearson:
    // 0.0125 + 0.05 + 0.05 + (0-0.2)^2/0.2 = 0.3125 — the last term is the
    // empty cell's, which N*sum(O^2/(rt*ct)) - N recovers from observed
    // cells alone: 5*(9/16 + 1/4 + 1/4) - 5 = 0.3125. Integer micro form:
    // 2812500 + 1250000 + 1250000 - 5000000 = 312500.
    val h = 1704067200L * 1000000000L
    val rows = Seq.fill(3)((h, "A")) ++ Seq((h + 3600L * 1000000000L, "A")) ++
      Seq((h, "B"))
    val df = rows.toDF("ts", "event_type")
    val r = Stats.chisqTypeHour(df).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((5L, 1L, 312500L)))
  }

  test("linreg: result is partitioning-invariant (decimal sums)") {
    val hour0ns = 1704067200L * 1000000000L
    val base = (0 until 97).map { i =>
      (hour0ns + (i % 13).toLong * 3600L * 1000000000L, "g", (i % 7) * 1.37)
    }
    val a = Stats.linreg(base.toDF("ts", "event_type", "value").repartition(1))
      .collect().head
    val b = Stats.linreg(base.toDF("ts", "event_type", "value").repartition(17))
      .collect().head
    assert(a == b)
  }
}
