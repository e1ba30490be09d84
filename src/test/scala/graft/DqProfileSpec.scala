package graft

import org.apache.spark.sql.functions._
import graft.ops.Stats

/** Round-11 DQ/profile additions: Benford screen, transition entropy,
  * robust length outliers, Zipf profile.
  */
class DqProfileSpec extends SparkSpec {
  import spark.implicits._
  private val d = "/root/testdata/sf0.001"

  test("benford: expected table sums to ~1e6 and a single-digit corpus maxes deviation") {
    assert(Stats.BenfordPpm.sum == 999995L, "floor'd log10 table mass")
    val ev = Seq.fill(100)(5.0).map(v => ("t", v)).toDF("event_type", "value")
    val r = Stats.benford(ev).collect()
    assert(r.length == 1 && r(0).getLong(0) == 5L)
    assert(r(0).getLong(2) == 1000000L, "all mass on digit 5")
    assert(r(0).getLong(4) == 1000000L - 79181L, "deviation vs expected 5-share")
  }

  test("benford: non-positive values are excluded; digits come from cents") {
    val ev = Seq(("t", 0.0), ("t", -3.0), ("t", 1.27), ("t", 0.04))
      .toDF("event_type", "value")
    // cents: 0 (drop), -300 (drop), 127 -> digit 1, 4 -> digit 4
    val r = Stats.benford(ev).collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r == Map(1L -> 1L, 4L -> 1L), s"got $r")
  }

  test("transition entropy: deterministic funnel scores 0 bits, uniform 2-way scores 1") {
    val out = SparkEntry.queries("events_transition_entropy")(spark, d).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nFrom, nTargets, bits) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nTargets >= 1 && bits >= 0, s"$r")
      // whole-bit mean is bounded by width(n_from): bits(t) <= log2(n_from)
      assert(bits <= 1000000L * 63, s"$r")
      assert(nFrom > 0)
    }
    // micro-fixture: A->B always = 0 bits; C->{A,B} uniform = 1 bit
    val hr = 1000000000L
    val ev = Seq(
      (1L, 0L, "A", 0L * hr), (1L, 1L, "B", 1L * hr),
      (1L, 2L, "A", 2L * hr), (1L, 3L, "B", 3L * hr),
      (2L, 4L, "C", 0L * hr), (2L, 5L, "D", 1L * hr),
      (2L, 6L, "C", 2L * hr), (2L, 7L, "B", 3L * hr))
      .toDF("user_id", "event_id", "event_type", "ts")
    // reuse builder semantics through a temp dir write
    val dir = java.nio.file.Files.createTempDirectory("tre").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val m = SparkEntry.queries("events_transition_entropy")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(3))).toMap
    assert(m("A") == 0L, s"A->B funnel must be 0 bits: $m")
    assert(m("C") == 1000000L, s"C uniform 2-way must be 1.0 bits: $m")
  }

  test("length outliers: planted mega-doc is flagged, typical docs are not") {
    val docs = ((1 to 99).map(i => (i.toLong, "w " * 50)) :+ (100L, "w " * 5000))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("qlo").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("quality_length_outliers")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getBoolean(4))).toMap
    assert(out(100L), "mega-doc must flag")
    assert((1 to 99).forall(i => !out(i.toLong)), "typical docs must not flag")
  }

  test("zipf profile: buckets are bit widths of ranks and mass conserves the token count") {
    val out = SparkEntry.queries("vocab_zipf_profile")(spark, d).collect()
    assert(out.nonEmpty)
    val totalMass = out.map(_.getLong(2)).sum
    val totalTokens = Tables.documents(spark, d)
      .select(explode(graft.llm.TextAnalysis.tokens(col("text"))).as("t"))
      .count()
    assert(totalMass == totalTokens, "bucket mass must partition the token count")
    out.foreach { r =>
      // bucket b holds ranks in [2^b, 2^(b+1)): at most 2^b terms
      assert(r.getLong(1) <= (1L << r.getLong(0)), s"bucket occupancy bound: $r")
      assert(r.getLong(4) <= r.getLong(5), s"min_f <= max_f: $r")
    }
  }
}
