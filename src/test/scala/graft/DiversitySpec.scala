package graft

import graft.llm.Diversity
import graft.ops.Assortativity
import org.apache.spark.sql.functions._

class DiversitySpec extends SparkSpec {
  import spark.implicits._

  test("simpson: exact ppm concentration per source; uniform < skewed") {
    val docs = Seq(
      (0L, "a a b", "skew"),    // counts 2,1 -> (4+1)*1e6 DIV 9 = 555555
      (1L, "a b c", "flat"),    // counts 1,1,1 -> 3e6 DIV 9 = 333333
      (2L, "", "empty"))        // no tokens -> no row
      .toDF("doc_id", "text", "source")
    val rows = Diversity.simpson(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows == Map(
      "skew" -> ((3L, 2L, 555555L)),
      "flat" -> ((3L, 3L, 333333L))), rows.toString)
  }

  test("simpson: single-type source reads the 1e6 ceiling") {
    val docs = Seq((0L, "x x x x", "mono")).toDF("doc_id", "text", "source")
    val r = Diversity.simpson(docs).collect().head
    assert(r.getLong(3) == 1000000L, r.toString)
  }

  test("zipf slope: exact log2-bucket OLS by hand; fixture reads the Zipf regime") {
    // geometric vocab — freqs 8,4,2,1 at ranks 1..4 — maps to the exact
    // bit-length points (0,3) (1,2) (1,1) (2,0); hand OLS slope = -1.5
    val pts = Seq((1L, 8L), (2L, 4L), (3L, 2L), (4L, 1L)).map { case (rk, f) =>
      (java.lang.Long.toBinaryString(rk).length - 1).toLong ->
        (java.lang.Long.toBinaryString(f).length - 1).toLong
    }
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum.toDouble; val sy = pts.map(_._2).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(slope - -1.5) < 1e-9, slope.toString)
    // the synthetic fixture has a small CLOSED vocabulary with
    // near-uniform frequencies — the slope correctly reads near-flat
    // (that IS the diagnostic: synthetic text is not Zipf-shaped),
    // still negative with a positive intercept
    val got = SparkEntry.queries("vocab_zipf_slope")(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(got.getLong(0) > 10L, got.toString)
    assert(got.getDouble(1) < 0.0 && got.getDouble(1) > -3.0, got.toString)
    assert(got.getDouble(2) > 0.0, got.toString)
  }

  // ---- degree assortativity (the sibling one-number structure screen) ----

  private def edges(es: (Long, Long)*) = es.toDF("a", "b")

  test("assortativity: star is perfectly disassortative, regular graph pins 0") {
    val star = Assortativity.degreeCorr(edges(1L -> 2L, 1L -> 3L, 1L -> 4L))
      .collect().head
    assert(star.getLong(0) == 3L && star.getDouble(1) == -1.0, star.toString)
    // triangle: every degree 2 -> zero variance -> denominator 0 -> 0.0
    val tri = Assortativity.degreeCorr(edges(1L -> 2L, 2L -> 3L, 1L -> 3L))
      .collect().head
    assert(tri.getLong(0) == 3L && tri.getDouble(1) == 0.0, tri.toString)
  }

  test("assortativity: two disjoint stars joined hub-to-hub move r above -1") {
    val lollipop = Assortativity.degreeCorr(edges(
      1L -> 2L, 1L -> 3L, 1L -> 4L, 5L -> 6L, 5L -> 7L, 5L -> 8L, 1L -> 5L))
      .collect().head
    assert(lollipop.getLong(0) == 7L, lollipop.toString)
    assert(lollipop.getDouble(1) > -1.0 && lollipop.getDouble(1) < 0.0,
      s"hub-hub edge adds assortative mass: ${lollipop.getDouble(1)}")
  }
}
