package graft

import org.apache.spark.sql.functions._
import graft.ops.Stats

/** Round-11 stats additions: Spearman ρ, Cohen's d, burstiness — each
  * checked against the textbook definition on hand-computable fixtures.
  */
class StatsEffectSpec extends SparkSpec {
  import spark.implicits._

  test("spearman: perfect monotone association gives rho 1, reversed gives -1") {
    val up = (1 to 50).map(i => (i.toLong, (i * 3 + 7).toLong)).toDF("x", "y")
    val r1 = Stats.spearman(up, "x", "y").head()
    assert(r1.getLong(0) == 50L && r1.getDouble(1) == 1.0, s"monotone: $r1")
    val down = (1 to 50).map(i => (i.toLong, (1000 - i).toLong)).toDF("x", "y")
    val r2 = Stats.spearman(down, "x", "y").head()
    assert(r2.getDouble(1) == -1.0, s"reversed: $r2")
  }

  test("spearman: tie-averaged ranks match the scipy-style Σd² value on a tied fixture") {
    // x = (1,2,2,3), y = (10,20,20,40): average ranks x=(1,2.5,2.5,4),
    // identical for y → d = 0 everywhere → rho = 1.
    val tied = Seq((1L, 10L), (2L, 20L), (2L, 20L), (3L, 40L)).toDF("x", "y")
    assert(Stats.spearman(tied, "x", "y").head().getDouble(1) == 1.0)
    // swap one pair: x=(1,2,2,3), y=(40,20,20,10) → ranks y reversed →
    // d² = (2·(1-4))², (0)², (0)², (2·(4-1))² over 4 = 9+0+0+9 = 18;
    // rho = 1 - 6·18/(4·15) = 1 - 1.8 = -0.8
    val anti = Seq((1L, 40L), (2L, 20L), (2L, 20L), (3L, 10L)).toDF("x", "y")
    assert(Stats.spearman(anti, "x", "y").head().getDouble(1) == -0.8)
  }

  test("spearman edge: single row and empty frame pin rho 0") {
    val one = Seq((5L, 9L)).toDF("x", "y")
    assert(Stats.spearman(one, "x", "y").head().getDouble(1) == 0.0)
  }

  test("cohens_d: hand-computed two-group fixture") {
    // type a: values 1,2,3 (cents 100,200,300): mean 200, m2 = Σ(y-ȳ)² = 20000
    // type b: values 5,6,7: mean 600, m2 = 20000
    // pooled = (20000+20000)/4 = 10000, sd = 100 → d = (200-600)/100 = -4
    val ev = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 5.0), ("b", 6.0), ("b", 7.0))
      .toDF("event_type", "value")
    val r = Stats.cohensDPairs(ev).head()
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getDouble(4) == -4.0, s"d_r: $r")
  }

  test("cohens_d: zero pooled variance and singleton pairs pin d 0") {
    val ev = Seq(("a", 2.0), ("a", 2.0), ("b", 2.0), ("b", 2.0), ("c", 9.0))
      .toDF("event_type", "value")
    val rows = Stats.cohensDPairs(ev).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(4))).toMap
    assert(rows(("a", "b")) == 0.0, "constant values: pooled sd 0 -> d 0")
    // (a, c): n_a=2, n_c=1 -> dof 1, m2_a = 0, m2_c = 0 -> pooled 0 -> 0
    assert(rows(("a", "c")) == 0.0)
  }

  test("ks_pairs: hand-computed two-sample D on a 3-cent fixture") {
    // a: {1, 2}, b: {2, 3} -> F_a = (.5, 1, 1), F_b = (0, .5, 1) on cents
    // (100, 200, 300): D = 0.5; d_num = max|ca*nb - cb*na| = 2 over 2*2
    val ev = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0))
      .toDF("event_type", "value")
    val r = Stats.ksPairs(ev).head()
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getLong(2) == 2L && r.getLong(3) == 2L)
    assert(r.getLong(4) == 2L, s"d_num: $r")
    assert(r.getDouble(5) == 0.5, s"d_r: $r")
  }

  test("ks_pairs: identical distributions give D 0") {
    val ev = Seq(("a", 1.0), ("a", 5.0), ("b", 1.0), ("b", 5.0))
      .toDF("event_type", "value")
    val r = Stats.ksPairs(ev).head()
    assert(r.getLong(4) == 0L && r.getDouble(5) == 0.0)
  }

  test("burstiness: metronome user lands in bucket 0 with B -1") {
    // gaps all equal and positive: sigma = 0, mu > 0 -> B = -1
    val base = 1700000000000000000L
    val ev = (0 until 10).map(i =>
        (7L, new java.sql.Timestamp(0), i.toLong, base + i * 1000000000L))
      .toDF("user_id", "tsd", "event_id", "tsl")
      .select(col("user_id"), col("tsl").as("ts"), col("event_id"))
    val r = Stats.burstiness(ev).collect()
    assert(r.length == 1 && r(0).getLong(0) == 0L && r(0).getDouble(2) == -1.0,
      s"metronome: ${r.toSeq}")
  }

  test("burstiness matches the window definition and buckets cover [-1,1]") {
    val out = SparkEntry.queries("events_gap_burstiness")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (b, bmin, bmax) = (r.getLong(0), r.getDouble(2), r.getDouble(3))
      assert(b >= 0 && b <= 9, s"bucket range: $r")
      assert(bmin >= -1.0 && bmax <= 1.0 && bmin <= bmax, s"B range: $r")
      assert(math.floor((bmin + 1.0) * 5.0).min(9).toLong == b, s"edge: $r")
    }
  }
}
