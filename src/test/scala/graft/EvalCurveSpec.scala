package graft

/** eval_pr_curve invariants: monotonicity, endpoints, internal consistency. */
class EvalCurveSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("pr curve: recall non-decreasing down the thresholds, endpoints exact, tp <= n_pred") {
    val rows = SparkEntry.queries("eval_pr_curve")(spark, d).collect()
    assert(rows.length > 1, "more than one distinct score on the fixture")
    rows.foreach { r =>
      val (nPred, tp) = (r.getLong(1), r.getLong(2))
      assert(tp <= nPred && nPred >= 1)
      assert(r.getLong(3) <= 1000000L && r.getLong(4) <= 1000000L)
    }
    // rows come ordered score DESC = thresholds loosening: n_pred and tp
    // are cumulative, recall never decreases
    val byThreshold = rows.toSeq
    assert(byThreshold.map(_.getLong(1)) == byThreshold.map(_.getLong(1)).sorted,
      "n_pred cumulative")
    assert(byThreshold.map(_.getLong(2)) == byThreshold.map(_.getLong(2)).sorted,
      "tp cumulative")
    val rec = byThreshold.map(_.getLong(4))
    assert(rec.zip(rec.tail).forall { case (a, b) => a <= b }, "recall monotone")
    // loosest threshold predicts everything: recall = 1 exactly (the
    // fixture has positives), n_pred = corpus size
    assert(rec.last == 1000000L, s"full-recall endpoint, got ${rec.last}")
    val n = Tables.documents(spark, d).count()
    assert(byThreshold.last.getLong(1) == n)
    // internal consistency with eval_auc's labels: total tp at the loosest
    // point equals the positive count of the Gopher gate
    val pos = graft.llm.Gopher.gates(Tables.documents(spark, d))
      .filter(org.apache.spark.sql.functions.col("gopher_pass")).count()
    assert(byThreshold.last.getLong(2) == pos)
  }
}
