package graft

import org.apache.spark.sql.functions._

/** Contracts of `quality_ks` — exact per-source KS drift — checked against
  * a brute-force driver-side recomputation on the fixture.
  */
class DriftSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private lazy val rows = SparkEntry.queries("quality_ks")(spark, d).collect()
    .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  /** Brute KS over the same floored-ppm CDFs, per source vs rest. */
  private lazy val brute: Map[String, (Long, Long, Long)] = {
    val base = spark.read.parquet(s"$d/documents.parquet")
      .select(col("source"),
        graft.llm.TextAnalysis.qualityScore(col("text")).as("q"))
      .select(col("source"),
        expr("CAST(round(q * 1000000, 0) AS BIGINT)").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = base.length.toLong
    val bySrc = base.groupBy(_._1)
    val axis = base.map(_._2).distinct.sorted
    bySrc.map { case (src, xs) =>
      val nSrc = xs.length.toLong
      val vs = xs.map(_._2)
      val restVs = base.filter(_._1 != src).map(_._2)
      val gaps = axis.map { v =>
        val fs = vs.count(_ <= v) * 1000000L / nSrc
        val fr = restVs.count(_ <= v) * 1000000L / (n - nSrc)
        (math.abs(fs - fr), v)
      }
      val best = gaps.maxBy { case (g, v) => (g, -v) }
      src -> (nSrc, best._1, best._2)
    }
  }

  test("engine KS matches the brute recomputation source-for-source") {
    assert(rows.nonEmpty)
    rows.foreach { case (src, nDocs, ks, vAt) =>
      val (bn, bks, bv) = brute(src)
      assert(nDocs == bn, s"$src: n_docs $nDocs != $bn")
      assert(ks == bks, s"$src: ks_ppm $ks != $bks")
      assert(vAt == bv, s"$src: argmax $vAt != $bv")
    }
    assert(rows.map(_._1).toSet == brute.keySet)
  }

  test("ks_ppm is a bounded statistic") {
    rows.foreach { case (src, _, ks, _) =>
      assert(ks >= 0 && ks <= 1000000L, s"$src: ks_ppm $ks out of [0, 1e6]")
    }
  }
}
