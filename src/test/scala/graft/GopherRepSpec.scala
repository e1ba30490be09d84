package graft

import graft.llm.GopherRep

class GopherRepSpec extends SparkSpec {
  import spark.implicits._

  private def row(df: org.apache.spark.sql.DataFrame, id: Long) =
    df.collect().map(r => r.getLong(0) -> r).toMap.apply(id)

  test("gates: hand-computed char fractions on a tiny repetitive doc") {
    // "a a a b": 2-grams "a a"x2 + "a b"x1, all len 3 -> top2 = 6/9;
    // 3-grams both unique, len 5 -> top3 = 5/10; the single 4-gram owns
    // all its mass -> top4 = 10^6, which fails the 0.16 gate (a doc this
    // short cannot pass the paper's top-4 rule — by design).
    val r = row(GopherRep.gates(Seq((1L, "a a a b")).toDF("doc_id", "text")), 1L)
    assert(r.getAs[Long]("top2_ppm") == 666666L)
    assert(r.getAs[Long]("top3_ppm") == 500000L)
    assert(r.getAs[Long]("top4_ppm") == 1000000L)
    assert(r.getAs[Long]("dup_line_ppm") == 0L)
    assert(!r.getAs[Boolean]("rep_pass"))
  }

  test("gates: an exactly repeated line trips the line AND long-gram rules") {
    // 20 tokens = the same 10-token line twice: both line occurrences are
    // duplicates (dup_line = 10^6), and every 5..10-gram fully inside
    // either half repeats.
    val line = (1 to 10).map(i => s"t$i").mkString(" ")
    val r = row(GopherRep.gates(Seq((2L, s"$line $line")).toDF("doc_id", "text")), 2L)
    assert(r.getAs[Long]("dup_line_ppm") == 1000000L)
    assert(r.getAs[Long]("dup_line_char_ppm") == 1000000L)
    assert(r.getAs[Long]("dup5_ppm") > 0L)
    assert(r.getAs[Long]("dup10_ppm") > 0L)
    assert(!r.getAs[Boolean]("rep_pass"))
  }

  test("gates: a long all-distinct doc passes every rule") {
    val text = (1 to 30).map(i => s"word$i").mkString(" ")
    val r = row(GopherRep.gates(Seq((3L, text)).toDF("doc_id", "text")), 3L)
    Seq("dup_line_ppm", "dup_line_char_ppm", "dup5_ppm", "dup6_ppm",
      "dup7_ppm", "dup8_ppm", "dup9_ppm", "dup10_ppm")
      .foreach(c => assert(r.getAs[Long](c) == 0L, c))
    assert(r.getAs[Boolean]("rep_pass"))
  }

  test("gates: a doc shorter than a gram size passes that gate vacuously") {
    // 3 tokens: no 5..10-grams at all -> dup5..dup10 coalesce to 0
    val r = row(GopherRep.gates(Seq((4L, "x y z")).toDF("doc_id", "text")), 4L)
    assert(r.getAs[Long]("dup5_ppm") == 0L && r.getAs[Long]("dup10_ppm") == 0L)
  }
}
