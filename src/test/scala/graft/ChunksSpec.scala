package graft

import org.apache.spark.sql.functions._

import graft.llm.Chunks

/** Content-defined chunking: shift robustness, partition property, postings. */
class ChunksSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("chunks partition the token stream: lengths sum to n_tok, ids contiguous from 0") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val cf = Chunks.chunkFrame(docs).localCheckpoint()
    val perDoc = cf.groupBy("doc_id")
      .agg(sum("n_tok").as("chunk_toks"), count(lit(1)).as("n_chunks"),
        min("chunk_id").as("lo"), max("chunk_id").as("hi"))
    val toks = docs.select(col("doc_id"),
      size(graft.llm.TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
    val bad = perDoc.join(toks, "doc_id")
      .filter(col("chunk_toks") =!= col("n_tok") ||
        col("lo") =!= 0L || col("hi") =!= col("n_chunks") - 1)
      .count()
    assert(bad == 0, s"$bad docs fail the partition property")
  }

  test("shift robustness: an injected prefix moves no boundary after the first cut") {
    val body = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8
    val a = docsDf(Seq((1L, body.trim)))
    val b = docsDf(Seq((2L, ("inject one two three " + body).trim)))
    val ca = Chunks.chunkFrame(a).select("ch").collect().map(_.getString(0)).toSet
    val cb = Chunks.chunkFrame(b).select("ch").collect().map(_.getString(0)).toSet
    // every chunk of the original except (possibly) its FIRST — whose
    // leading edge is the doc start, not a content cut — must reappear
    // verbatim in the prefixed version
    val firstA = Chunks.chunkFrame(a).orderBy("chunk_id")
      .select("ch").collect().head.getString(0)
    val missing = (ca - firstA) -- cb
    assert(missing.isEmpty, s"shifted chunks changed: $missing")
    // sanity: the aligned-line view would NOT survive this shift (the
    // 4-token inject is not a multiple of the 10-token line width)
    val la = graft.llm.Lines.lineFrame(a).select("lh").collect().map(_.getString(0)).toSet
    val lb = graft.llm.Lines.lineFrame(b).select("lh").collect().map(_.getString(0)).toSet
    assert((la intersect lb).size < la.size, "line view should break under shift")
  }

  test("chunkHashesRowwise == chunkFrame per-doc multiset (the streaming split)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val fromFrame = Chunks.chunkFrame(docs)
      .groupBy("doc_id").agg(sort_array(collect_list(col("ch"))).as("hs"))
    val fromRow = docs
      .select(col("doc_id"), sort_array(Chunks.chunkHashesRowwise(col("text"))).as("hs"))
      .filter(size(col("hs")) > 0)
    val diff = fromFrame.as("a").join(fromRow.as("b"), Seq("doc_id"))
      .filter(col("a.hs") =!= col("b.hs")).count()
    assert(diff == 0, s"$diff docs diverge between rowwise and frame chunking")
    assert(fromFrame.count() == fromRow.count())
  }

  test("postings: cross-doc chunks only, owner = min doc; the spectrum story holds on the fixture") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val posts = Chunks.postings(docs).collect()
    assert(posts.nonEmpty, "fixture carries cross-doc duplicated chunks")
    posts.foreach { r =>
      assert(r.getLong(1) >= 2, "n_docs >= 2 by definition")
      assert(r.getLong(2) >= r.getLong(1), "occurrences >= carrying docs")
    }
    // volume: chunk stream is ~tokens/D rows — strictly fewer rows than
    // the stride-1 window stream on the same corpus
    val nChunks = Chunks.chunkFrame(docs).count()
    val nWins = graft.llm.Substring.windowFrame(docs, 4).count()
    assert(nChunks < nWins, s"chunk rows ($nChunks) < window rows ($nWins)")
  }
}
