package graft

import graft.llm.C4

class C4Spec extends SparkSpec {
  import spark.implicits._

  private def row(df: org.apache.spark.sql.DataFrame, id: Long) =
    df.collect().map(r => r.getLong(0) -> r).toMap.apply(id)

  test("gates: line keep rules — punct class and short last line") {
    // doc 0: 12 tokens -> 2 lines; class(i) = i % 4: line 0 ends '.', line
    // 1 ends '!' but has only 2 words (< 3) -> 1 kept line of 10 words.
    // doc_id 0 % 17 = 0 -> page carries "lorem ipsum" -> fails regardless.
    val r = row(C4.gates(Seq((0L, Seq.fill(12)("tok").mkString(" ")))
      .toDF("doc_id", "text")), 0L)
    assert(r.getAs[Long]("n_words") == 12L && r.getAs[Long]("n_lines") == 2L)
    assert(r.getAs[Long]("n_kept") == 1L)
    assert(r.getAs[Long]("kept_words") == 10L)
    assert(r.getAs[Boolean]("has_lorem") && !r.getAs[Boolean]("has_brace"))
    assert(!r.getAs[Boolean]("c4_pass"))
  }

  test("gates: a 70-token doc passes with exactly MinSentences kept lines") {
    // doc 1: class(i) = (31 + i) % 4 over i = 0..6 -> [3,0,1,2,3,0,1]:
    // line 0 and 4 carry "javascript" (dropped); 5 kept full lines.
    val r = row(C4.gates(Seq((1L, Seq.fill(70)("tok").mkString(" ")))
      .toDF("doc_id", "text")), 1L)
    assert(r.getAs[Long]("n_kept") == 5L)
    assert(r.getAs[Long]("kept_words") == 50L)
    assert(!r.getAs[Boolean]("has_lorem") && !r.getAs[Boolean]("has_brace"))
    assert(r.getAs[Boolean]("c4_pass"))
  }

  test("gates: brace page gate fires on doc_id % 23 = 3") {
    val r = row(C4.gates(Seq((3L, Seq.fill(70)("tok").mkString(" ")))
      .toDF("doc_id", "text")), 3L)
    assert(r.getAs[Boolean]("has_brace") && !r.getAs[Boolean]("c4_pass"))
  }

  test("gates: empty doc has zero lines and fails") {
    val r = row(C4.gates(Seq((1L, "")).toDF("doc_id", "text")), 1L)
    assert(r.getAs[Long]("n_lines") == 0L && r.getAs[Long]("n_kept") == 0L)
    assert(r.getAs[Long]("kept_words") == 0L)
    assert(!r.getAs[Boolean]("c4_pass"))
  }
}
