package graft

import org.apache.spark.sql.functions._

import graft.llm.Lines

/** CCNet-style aligned-line dedup: line view, postings, scrub contracts. */
class LinesSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def words(range: Range, p: String = "w") = range.map(i => s"$p$i").mkString(" ")

  test("lineFrame: ceil(n/w) aligned lines; tail slice is a line; empty docs emit none") {
    val df = docsDf(Seq((1L, words(1 to 23)), (2L, ""), (3L, words(1 to 10))))
    val lf = Lines.lineFrame(df, w = 10).collect()
    assert(lf.count(_.getLong(0) == 1L) == 3, "23 tokens -> lines 0,1,2 (tail of 3)")
    assert(!lf.exists(_.getLong(0) == 2L), "empty doc emits no lines")
    assert(lf.count(_.getLong(0) == 3L) == 1, "exactly-w doc is one line")
    // alignment: doc 3's single full line equals doc 1's first line iff the
    // token slices match — they don't (w1..w10 vs w1..w10 DO match)
    val h1 = lf.filter(r => r.getLong(0) == 1L && r.getLong(1) == 0L).head.getString(2)
    val h3 = lf.filter(_.getLong(0) == 3L).head.getString(2)
    assert(h1 == h3, "identical aligned slices hash identically")
  }

  test("postings: cross-doc lines only; unaligned copies do NOT match (the CCNet trade)") {
    val shared = words(1 to 10, "s")
    val df = docsDf(Seq(
      (1L, shared + " " + words(1 to 10, "a")),        // shared at line 0
      (2L, shared + " " + words(1 to 10, "b")),        // shared at line 0
      (3L, words(1 to 5, "c") + " " + shared),         // shared but offset 5 — unaligned
      (4L, words(1 to 10, "r") + " " + words(1 to 10, "r")))) // within-doc repeat only
    val posts = Lines.postings(df, w = 10).collect()
    assert(posts.length == 1, s"exactly the aligned shared line, got ${posts.length}")
    val r = posts.head
    assert(r.getLong(1) == 2 && r.getLong(2) == 2 && r.getLong(3) == 1L,
      "df=2 (docs 1,2), occ=2, owner=min doc")
  }

  test("scrub: keep-one ownership, line mass conserved, within-doc repeats kept") {
    val shared = words(1 to 10, "s")
    val rep = words(1 to 10, "r")
    val df = docsDf(Seq(
      (1L, shared + " " + words(1 to 10, "a")),
      (2L, shared + " " + words(1 to 10, "b")),
      (3L, rep + " " + rep))) // internal repeat, no cross-doc pair
    val rows = Lines.scrub(df, w = 10).collect()
      .map(r => r.getLong(0) -> r).toMap
    // owner (doc 1) keeps both lines; doc 2 loses the shared line
    assert(rows(1L).getLong(2) == 0 && rows(1L).getLong(3) == 2)
    assert(rows(2L).getLong(2) == 1 && rows(2L).getLong(3) == 1)
    assert(rows(2L).getString(4) == words(1 to 10, "b"), "doc 2 keeps only its own line")
    // within-doc repetition is not cross-doc boilerplate — untouched
    assert(rows(3L).getLong(2) == 0 && rows(3L).getString(4) == rep + " " + rep)
    // conservation: n_kept + n_removed = n_lines, every doc present
    rows.values.foreach(r => assert(r.getLong(1) == r.getLong(2) + r.getLong(3)))
  }

  test("scrub invariant + fixpoint on the real fixture: no input dup line survives twice; pass 2 removes nothing") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val scrubbed = Lines.scrub(docs, Lines.LineWidthTok)
      .select(col("doc_id"), col("clean_text").as("text"))
      .localCheckpoint()
    // invariant: the scrubbed corpus has no cross-doc duplicated line at
    // the REBUILT alignment (aligned removal cannot mint new lines)
    val residual = Lines.postings(scrubbed, Lines.LineWidthTok).count()
    assert(residual == 0, s"scrub left $residual cross-doc duplicated lines")
    // fixpoint: a second pass removes nothing
    val pass2 = Lines.scrub(scrubbed, Lines.LineWidthTok)
    assert(pass2.agg(sum("n_removed")).collect().head.getLong(0) == 0)
  }

  test("line granularity is cheaper than rolling windows: tokens/w rows, not tokens") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val nLines = Lines.lineFrame(docs, 10).count()
    val nWins = graft.llm.Substring.windowFrame(docs, 10).count()
    assert(nLines * 5 < nWins, s"aligned lines ($nLines) ~ windows ($nWins) / w")
  }
}
