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

  test("rowwiseGates == gates on a mixed fixture (the streaming form)") {
    val line = (1 to 10).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, "a a a b"),
      (2L, s"$line $line"),
      (3L, (1 to 30).map(i => s"word$i").mkString(" ")),
      (4L, "x y z"),
      (5L, "r r r r r r r r r r r r"),
      (6L, "")).toDF("doc_id", "text") // zero-token doc MUST keep its row
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val (row, agg) = (key(GopherRep.rowwiseGates(docs)), key(GopherRep.gates(docs)))
    assert(row == agg)
    assert(agg.size == 6, "one verdict row per doc, empty docs included")
    assert(agg(6L).last == true, "empty doc has nothing repetitious -> passes")
  }

  test("streaming publishedProbe == batch three-filter admission") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sql = spark.sqlContext
    val line = (1 to 10).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, "a a a b"),
      (2L, s"$line $line"),
      (3L, (Seq.fill(59)("word") ++ Seq("the", "have")).mkString(" ")),
      (4L, (1 to 70).map(i => s"w$i").mkString(" ")))
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.DocStream
      .publishedProbe(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("pub_probe")
      .outputMode("append").start()
    try {
      in.addData(docs.take(2): _*); q.processAllAvailable()
      in.addData(docs.drop(2): _*); q.processAllAvailable()
      val streamed = spark.table("pub_probe").collect()
        .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2),
          r.getBoolean(3), r.getBoolean(4)))).toMap
      val df = docs.toDF("doc_id", "text")
      val batch = graft.llm.Gopher.gates(df).select("doc_id", "gopher_pass")
        .join(GopherRep.gates(df).select("doc_id", "rep_pass"), "doc_id")
        .join(graft.llm.C4.gates(df).select("doc_id", "c4_pass"), "doc_id")
        .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2),
          r.getBoolean(3),
          r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3)))).toMap
      assert(streamed == batch)
      assert(streamed.size == 4)
    } finally q.stop()
  }

  test("gates: a doc shorter than a gram size passes that gate vacuously") {
    // 3 tokens: no 5..10-grams at all -> dup5..dup10 coalesce to 0
    val r = row(GopherRep.gates(Seq((4L, "x y z")).toDF("doc_id", "text")), 4L)
    assert(r.getAs[Long]("dup5_ppm") == 0L && r.getAs[Long]("dup10_ppm") == 0L)
  }
}
