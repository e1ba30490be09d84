package graft

import graft.llm.Readability

class ReadabilitySpec extends SparkSpec {
  import spark.implicits._

  test("fk: hand-computed scores on a two-sentence doc; empty doc reads NULL") {
    // tokens: [the, cat, sat., the, dog, ran!] — 6 words, each one vowel
    // group; sentence runs "." and "!" -> 2
    val docs = Seq((0L, "the cat sat. the dog ran!"), (1L, ""))
      .toDF("doc_id", "text")
    val rows = Readability.fk(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val d0 = rows(0L)
    assert((d0.getLong(1), d0.getLong(2), d0.getLong(3)) == ((6L, 2L, 6L)))
    // 206835000 - (1015000*6) DIV 2 - (84600000*6) DIV 6 = 119190000
    assert(d0.getLong(4) == 119190000L, s"fre: $d0")
    // (390000*6) DIV 2 + (11800000*6) DIV 6 - 15590000 = -2620000
    assert(d0.getLong(5) == -2620000L, s"grade: $d0")
    val d1 = rows(1L)
    assert(d1.getLong(1) == 0L && d1.getLong(2) == 1L && d1.getLong(3) == 0L)
    assert(d1.isNullAt(4) && d1.isNullAt(5), "empty doc scores are NULL")
  }

  test("fk: vowel-group syllables count runs, vowel-less words clamp to 1") {
    // beautiful -> eau/i/u = 3 groups; xyz77 -> y = 1; 123 -> clamp 1
    val docs = Seq((0L, "beautiful xyz77 123")).toDF("doc_id", "text")
    val r = Readability.fk(docs).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((3L, 1L, 5L)), r.toString)
  }

  test("fk: more syllables per word lowers reading ease, raises grade") {
    val docs = Seq(
      (0L, "one two three. four five six."),
      (1L, "cardiovascular rehabilitation anesthesiology. ophthalmological gastroenterology idiosyncratically."))
      .toDF("doc_id", "text")
    val rows = Readability.fk(docs).collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(0L).getLong(4) > rows(1L).getLong(4), "easy text scores higher FRE")
    assert(rows(0L).getLong(5) < rows(1L).getLong(5), "hard text scores higher grade")
  }
}
