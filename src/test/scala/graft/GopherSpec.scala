package graft

import graft.llm.Gopher

class GopherSpec extends SparkSpec {
  import spark.implicits._

  private def row(df: org.apache.spark.sql.DataFrame, id: Long) =
    df.collect().map(r => r.getLong(0) -> r).toMap.apply(id)

  test("gates: hand-computed counters and verdicts for a short failing doc") {
    // doc 0: 12 tokens of length 2 → n_lines = 2; deco(i) = i % 5 so line 0
    // is a bullet, line 1 ends with an ellipsis; no symbol/stopword lines.
    val docs = Seq((0L, "aa bb cc dd ee ff gg hh ii jj kk ll"))
      .toDF("doc_id", "text")
    val r = row(Gopher.gates(docs), 0L)
    assert(r.getAs[Long]("n_words") == 12L)
    assert(r.getAs[Long]("n_lines") == 2L)
    assert(r.getAs[Long]("n_bullet") == 1L)
    assert(r.getAs[Long]("n_ellipsis") == 1L)
    assert(r.getAs[Long]("n_sym") == 0L)
    assert(r.getAs[Long]("sum_len") == 24L)
    assert(r.getAs[Long]("n_alpha") == 12L)
    assert(r.getAs[Long]("n_stop") == 0L)
    assert(!r.getAs[Boolean]("ok_words"), "12 < 50")
    assert(!r.getAs[Boolean]("ok_meanlen"), "mean 2.0 < 3")
    assert(r.getAs[Boolean]("ok_sym"))
    assert(r.getAs[Boolean]("ok_bullet"), "1 of 2 lines <= 90%")
    assert(!r.getAs[Boolean]("ok_ellipsis"), "1 of 2 lines > 30%")
    assert(r.getAs[Boolean]("ok_alpha"))
    assert(!r.getAs[Boolean]("ok_stop"))
    assert(!r.getAs[Boolean]("gopher_pass"))
  }

  test("gates: a doc engineered to pass all 7 published gates") {
    // doc 1: 61 base tokens (59 × "word" + "the" + "have") → n_lines = 7;
    // deco(i) = (31 + i) % 5 over i = 0..6 → [1,2,3,4,0,1,2]: 1 bullet,
    // 2 ellipsis lines, 2 symbol words ("#42", 3 chars, non-alpha), and one
    // injected stopword at i=2: GopherStops[(1 + 2) % 8] = "of".
    val text = (Seq.fill(59)("word") ++ Seq("the", "have")).mkString(" ")
    val r = row(Gopher.gates(Seq((1L, text)).toDF("doc_id", "text")), 1L)
    assert(r.getAs[Long]("n_words") == 64L, "61 base + 2 sym + 1 stop")
    assert(r.getAs[Long]("n_lines") == 7L)
    assert(r.getAs[Long]("n_bullet") == 1L)
    assert(r.getAs[Long]("n_ellipsis") == 2L)
    assert(r.getAs[Long]("n_sym") == 2L)
    assert(r.getAs[Long]("sum_len") == 59 * 4 + 3 + 4 + 2 * 3 + 2,
      "base lengths + two '#42' + 'of'")
    assert(r.getAs[Long]("n_alpha") == 62L, "61 alpha base + injected 'of'")
    assert(r.getAs[Long]("n_stop") == 3L, "{the, have} in text + injected 'of'")
    Seq("ok_words", "ok_meanlen", "ok_sym", "ok_bullet", "ok_ellipsis",
      "ok_alpha", "ok_stop", "gopher_pass")
      .foreach(c => assert(r.getAs[Boolean](c), c))
  }

  test("gates: empty text yields zero counters and fails word gates only by count") {
    val r = row(Gopher.gates(Seq((5L, "")).toDF("doc_id", "text")), 5L)
    assert(r.getAs[Long]("n_words") == 0L && r.getAs[Long]("n_lines") == 0L)
    assert(r.getAs[Long]("sum_len") == 0L && r.getAs[Long]("n_stop") == 0L)
    assert(!r.getAs[Boolean]("ok_words"))
    // vacuous line gates hold on 0 lines (0 <= 0)
    assert(r.getAs[Boolean]("ok_bullet") && r.getAs[Boolean]("ok_ellipsis"))
    assert(!r.getAs[Boolean]("gopher_pass"))
  }

  test("streaming gopherProbe == batch gates over the same docs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val docs = Seq(
      (0L, "aa bb cc dd ee ff gg hh ii jj kk ll"),
      (1L, (Seq.fill(59)("word") ++ Seq("the", "have")).mkString(" ")),
      (5L, ""))
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.DocStream.gopherProbe(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("gopher_probe")
      .outputMode("append").start()
    try {
      in.addData(docs.take(1): _*); q.processAllAvailable()
      in.addData(docs.drop(1): _*); q.processAllAvailable()
      val streamed = spark.table("gopher_probe").collect()
        .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      val batch = Gopher.gates(docs.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      assert(streamed == batch)
      assert(streamed.size == 3)
    } finally q.stop()
  }

  test("gates: stopword distinctness — repeats of one stopword count once") {
    // 4 tokens, 1 line, deco(0) = (7*31) % 5 = 217 % 5 = 2 → symbol line,
    // no injected stopword; "the the the" collapses to one distinct stop.
    val r = row(Gopher.gates(Seq((7L, "the the the word")).toDF("doc_id", "text")), 7L)
    assert(r.getAs[Long]("n_stop") == 1L)
    assert(r.getAs[Long]("n_sym") == 1L)
    assert(!r.getAs[Boolean]("ok_stop"))
  }
}
