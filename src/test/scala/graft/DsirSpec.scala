package graft

/** Contracts of the DSIR-shaped importance scorer (`dsir_weights`): total
  * coverage, score polarity toward the target slice, and determinism.
  */
class DsirSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private lazy val rows = SparkEntry.queries("dsir_weights")(spark, d)
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))

  test("every document scores exactly once; empty docs score 0 and drop") {
    val docs = spark.read.parquet(s"$d/documents.parquet").count()
    assert(rows.length == docs)
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.filter(_._2 == 0L).foreach { case (_, _, sp, keep) =>
      assert(sp == 0L && !keep, "featureless doc must be score-0, keep=false")
    }
  }

  test("keep flag is exactly the positive-score set") {
    rows.foreach { case (id, _, sp, keep) =>
      assert(keep == (sp > 0L), s"doc $id: score=$sp keep=$keep")
    }
  }

  test("target-language docs score higher than non-target on average") {
    import org.apache.spark.sql.functions._
    val langs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (tgt, rest) = rows.partition(r => langs(r._1) == "en")
    assert(tgt.nonEmpty && rest.nonEmpty, "fixture must carry both slices")
    val mTgt = tgt.map(_._3).sum.toDouble / tgt.length
    val mRest = rest.map(_._3).sum.toDouble / rest.length
    assert(mTgt > mRest,
      s"target mean $mTgt must exceed non-target mean $mRest — the scorer " +
        "exists to separate exactly these slices")
  }

  test("deterministic across runs") {
    val again = SparkEntry.queries("dsir_weights")(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.toSeq == again.toSeq)
  }

  test("dsir_select: keep set is exactly the top quartile of dsir_weights scores") {
    val sel = SparkEntry.queries("dsir_select")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getBoolean(3)))
    assert(sel.length == rows.length, "selection covers every scored doc")
    val scores = rows.map(r => r._1 -> r._3).toMap
    sel.foreach { case (id, sp, q, keep) =>
      assert(sp == scores(id), s"doc $id: select score $sp != weights score")
      assert(keep == (q == 4))
    }
    // quartile assignment respects the (score, doc_id) total order
    val byQ = sel.sortBy(s => (s._2, s._1)).map(_._3).toSeq
    assert(byQ == byQ.sorted, "quartiles must be monotone in the score order")
    val kept = sel.count(_._4)
    assert(math.abs(kept - sel.length / 4) <= 1, s"top quartile size: $kept")
  }

  test("dsirProbe: frozen-ratio streaming scores are batching-invariant") {
    import org.apache.spark.sql.functions._
    import graft.llm.Dsir
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val delta = docs.filter(col("doc_id") % 5 === 0)
    val frozen = Dsir.ratios(
      Dsir.docFeatures(corpus, col("lang") === Dsir.TargetLang))
      .localCheckpoint()
    def snap(df: org.apache.spark.sql.DataFrame) =
      graft.streaming.DocStream.dsirProbe(df, frozen)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val oneShot = snap(delta)
    val b1 = snap(delta.filter(col("doc_id") % 2 === 0))
    val b2 = snap(delta.filter(col("doc_id") % 2 =!= 0))
    assert(oneShot == (b1 ++ b2),
      "per-doc scores against a frozen ratio table must not depend on batching")
    assert(oneShot.map(_._1) == delta.collect().map(_.getLong(0)).toSet,
      "every delta doc scores exactly once")
  }
}
