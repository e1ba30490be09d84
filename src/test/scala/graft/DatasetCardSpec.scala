package graft

import org.apache.spark.sql.functions._

/** `mix_doremi` (one DoReMi multiplicative-weights step) and
  * `dataset_card` (the corpus release summary) — each metric re-derived
  * independently from the fixture.
  */
class DatasetCardSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("mix_doremi: per-language loss re-derived from lm_score; update is η·excess") {
    val lm = SparkEntry.queries("lm_score")(spark, d) // doc_id, n_bigrams, lm_ppm
    val rows = Tables.documents(spark, d).select(col("doc_id"), col("lang"))
      .join(lm, Seq("doc_id")).filter(col("n_bigrams") > 0)
      .select("lang", "n_bigrams", "lm_ppm").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byLang = rows.groupBy(_._1)
    def lossPpm(rs: Array[(String, Long, Long)]): Long =
      (rs.map(t => BigInt(1000000L - t._3) * t._2).sum / rs.map(_._2).sum).toLong
    val ref = lossPpm(rows)

    val out = SparkEntry.queries("mix_doremi")(spark, d).collect()
    assert(out.map(_.getString(0)).toSeq == byLang.keys.toSeq.sorted)
    out.foreach { r =>
      val rs = byLang(r.getString(0))
      val loss = lossPpm(rs)
      val excess = math.max(0L, loss - ref)
      assert(r.getLong(1) == rs.length, s"${r.getString(0)} n_docs")
      assert(r.getLong(2) == rs.map(_._2).sum, s"${r.getString(0)} n_bigrams")
      assert(r.getLong(3) == loss, s"${r.getString(0)} loss_ppm")
      assert(r.getLong(4) == ref, s"${r.getString(0)} ref_ppm")
      assert(r.getLong(5) == excess, s"${r.getString(0)} excess_ppm")
      assert(r.getLong(6) == 100000L * excess / 1000000L,
        s"${r.getString(0)} logw_delta_ppm")
    }
    // the step must actually move weights on the fixture: some language
    // models worse than the corpus (excess > 0) and at least one sits at
    // or below the reference (excess == 0)
    assert(out.exists(_.getLong(5) > 0) && out.exists(_.getLong(5) == 0))
  }

  test("dataset_card: every metric re-derived independently") {
    val card = SparkEntry.queries("dataset_card")(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(card.size == 9)
    val docs = Tables.documents(spark, d)
    val nDocs = docs.count()
    assert(card("n_docs") == nDocs)
    assert(card("n_chars") == docs.agg(sum("n_chars")).head.getLong(0))
    assert(card("n_tokens") == docs
      .select(size(graft.llm.TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .agg(sum("n")).head.getLong(0))
    assert(card("n_langs") == docs.select("lang").distinct().count())
    // host universe == quality_by_domain's row set (same canonicalization)
    assert(card("n_hosts") ==
      SparkEntry.queries("quality_by_domain")(spark, d).count())
    val uniq = docs.select(graft.llm.Dedup.fingerprint(col("text")).as("fp"))
      .distinct().count()
    assert(card("dup_docs") == nDocs - uniq)
    assert(card("dup_ppm") == (nDocs - uniq) * 1000000L / nDocs)
    assert(card("pii_docs") == docs.filter(
      graft.llm.Scrub.emailCount(col("text")) +
        graft.llm.Scrub.phoneCount(col("text")) > 0).count())
    val qSum = docs.select(
        round(graft.llm.TextAnalysis.qualityScore(col("text")) * 1000000L, 0)
          .cast("long").as("q"))
      .agg(sum("q")).head.getLong(0)
    assert(card("mean_quality_ppm") == qSum / nDocs)
  }
}
