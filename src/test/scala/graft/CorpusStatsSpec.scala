package graft

import org.apache.spark.sql.functions._

/** Batch-F contracts: t-closeness release audit, dense time fill,
  * vocabulary-growth curve, co-occurrence lift.
  */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("dedup_keep_best: one keeper per cluster, and it is the argmax-quality member") {
    val rows = SparkEntry.queries("dedup_keep_best")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("cluster_id")).foreach { case (c, rs) =>
      val kept = rs.filter(_.getAs[Boolean]("keep"))
      assert(kept.length == 1, s"cluster $c keeps exactly one member")
      val best = rs.maxBy(r => (r.getAs[Double]("quality"), -r.getAs[Long]("doc_id")))
      assert(kept.head.getAs[Long]("doc_id") == best.getAs[Long]("doc_id"),
        s"cluster $c keeper is max quality, ties to smallest id")
    }
    // same clustering as dedup_decisions — only the keeper policy differs
    val dec = SparkEntry.queries("dedup_decisions")(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    rows.foreach(r =>
      assert(dec(r.getAs[Long]("doc_id")) == r.getAs[Long]("cluster_id")))
    assert(rows.count(_.getAs[Boolean]("keep")) == dec.values.toSet.size)
  }

  test("export_balance: rollup agrees with export_shards row for row") {
    val shards = SparkEntry.queries("export_shards")(spark, d).collect()
      .map(r => (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))
    val bal = SparkEntry.queries("export_balance")(spark, d).collect()
    assert(bal.length == 1)
    val b = bal.head
    assert(b.getAs[Int]("n_shards") == shards.length)
    assert(b.getAs[Long]("docs_total") == shards.map(_._1).sum)
    assert(b.getAs[Long]("tok_total") == shards.map(_._2).sum)
    assert(b.getAs[Long]("tok_max") == shards.map(_._2).max)
    assert(b.getAs[Long]("tok_min") == shards.map(_._2).min)
    assert(b.getAs[Long]("tok_balance_ppm") ==
      shards.map(_._2).max * shards.length * 1000000L / shards.map(_._2).sum)
    // longest-first round-robin should land well under a 2x straggler
    assert(b.getAs[Long]("tok_balance_ppm") < 2000000L)
  }

  test("t_closeness: folded TVD equals the brute-force cell x value cross") {
    val rep = SparkEntry.queries("t_closeness")(spark, d).collect()
    assert(rep.nonEmpty)
    for (r <- rep) {
      val ppm = r.getAs[Long]("tvd_ppm")
      assert(ppm >= 0L && ppm <= 1000000L, s"TVD is a probability distance: $ppm")
      assert((r.getAs[Int]("at_risk") == 1) == (ppm > 300000L))
    }
    // Brute force: materialize the FULL cell x segment cross (absent
    // values as zero counts) and recompute Σ|p−q| directly — the folded
    // present-terms-only aggregate must match it cell for cell.
    val q = Tables.customer(spark, d)
      .select(col("c_nationkey"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_bin"),
        col("c_mktsegment"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    val n = q.length.toLong
    val gv = q.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val byCell = q.groupBy(t => (t._1, t._2))
    for (r <- rep) {
      val key = (r.getAs[Int]("c_nationkey"), r.getAs[Long]("bal_bin"))
      val cellRows = byCell(key)
      val nc = cellRows.length.toLong
      assert(r.getAs[Long]("n_c") == nc)
      val cnt = cellRows.groupBy(_._3).view.mapValues(_.length.toLong).toMap
      // (toSeq: mapping over gv.keys — a Set — would collapse equal terms)
      val num = gv.toSeq.map { case (v, g) =>
        math.abs(cnt.getOrElse(v, 0L) * n - g * nc)
      }.sum
      val expected = (BigInt(num) * 500000 / (BigInt(nc) * n)).toLong
      assert(r.getAs[Long]("tvd_ppm") == expected,
        s"cell $key: folded ${r.getAs[Long]("tvd_ppm")} != brute $expected")
    }
  }

  test("events_gapfill: dense grid is complete, contiguous and count-preserving") {
    val rows = SparkEntry.queries("events_gapfill")(spark, d).collect()
    val types = rows.map(_.getAs[String]("event_type")).distinct
    val hours = rows.map(_.getAs[Long]("hour_epoch")).distinct.sorted
    assert(rows.length == types.length * hours.length, "full type x hour grid")
    assert(hours.zip(hours.tail).forall { case (a, b) => b - a == 3600L },
      "hour axis has no holes")
    val totalEvents = Tables.events(spark, d).count()
    assert(rows.map(_.getAs[Long]("n")).sum == totalEvents,
      "zero-filling must not create or lose events")
    assert(rows.exists(_.getAs[Long]("n") == 0L),
      "fixture has empty (type, hour) cells — the fill must surface them")
    // cum_n at each type's last hour equals that type's total
    val lastHour = hours.last
    for (r <- rows if r.getAs[Long]("hour_epoch") == lastHour) {
      val t = r.getAs[String]("event_type")
      val tot = rows.filter(_.getAs[String]("event_type") == t)
        .map(_.getAs[Long]("n")).sum
      assert(r.getAs[Long]("cum_n") == tot)
    }
  }

  test("vocab_growth: cumulative vocabulary saturates at the true distinct count") {
    val rows = SparkEntry.queries("vocab_growth")(spark, d).collect()
    assert(rows.map(_.getAs[Long]("bucket")).toSeq ==
      (0L until 10L), "every bucket present, in order")
    val cumV = rows.map(_.getAs[Long]("cum_vocab"))
    assert(cumV.zip(cumV.tail).forall { case (a, b) => a <= b },
      "vocabulary never shrinks")
    val docs = Tables.documents(spark, d)
    val trueVocab = docs
      .select(explode(graft.llm.TextAnalysis.tokens(col("text"))).as("t"))
      .distinct().count()
    assert(cumV.last == trueVocab)
    val trueTokens = docs
      .select(size(graft.llm.TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(rows.map(_.getAs[Long]("cum_tokens")).last == trueTokens)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
  }

  test("quality_sweep: monotone keep curve, exact against per-doc scores") {
    val rows = SparkEntry.queries("quality_sweep")(spark, d).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.length == 5)
    // keep counts can only shrink as the cutoff rises
    assert(rows.zip(rows.tail).forall { case (a, b) => a._2 >= b._2 && a._3 >= b._3 })
    // exact replay from the per-doc quality scores + token counts
    val perDoc = Tables.documents(spark, d)
      .select(graft.llm.TextAnalysis.qualityScore(col("text")).as("q"),
        size(graft.llm.TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    val (tDocs, tToks) = (perDoc.length.toLong, perDoc.map(_._2).sum)
    for ((thr, nDocs, nToks, dPpm, tPpm) <- rows) {
      val kept = perDoc.filter(_._1 >= thr)
      assert(nDocs == kept.length.toLong && nToks == kept.map(_._2).sum,
        s"thr=$thr keep mismatch")
      assert(dPpm == nDocs * 1000000L / tDocs && tPpm == nToks * 1000000L / tToks)
    }
  }

  test("pmi_topk: ordering, gate bounds, and an exact pair-count replay") {
    val rows = SparkEntry.queries("pmi_topk")(spark, d).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    val lifts = rows.map(_.getAs[Long]("lift_ppm"))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b },
      "descending lift order")
    val nDocs = Tables.documents(spark, d).count()
    for (r <- rows) {
      assert(r.getAs[Long]("n_ab") >= 3L, "support floor")
      for (dfc <- Seq("df_a", "df_b")) {
        val df = r.getAs[Long](dfc)
        assert(df >= 2L && df * 1000000L <= nDocs * 800000L, "df gates")
      }
    }
    // Replay the top pair's co-occurrence count by brute force over the
    // per-doc distinct token sets (the per-doc M gate is inactive on this
    // fixture's ~30-term vocabulary, so plain set containment is exact).
    val top = rows.head
    val (ta, tb) = (top.getAs[String]("ta"), top.getAs[String]("tb"))
    val sets = Tables.documents(spark, d)
      .select(array_distinct(graft.llm.TextAnalysis.tokens(col("text"))).as("ts"))
      .collect().map(_.getSeq[String](0).toSet)
    val brute = sets.count(s => s.contains(ta) && s.contains(tb)).toLong
    assert(top.getAs[Long]("n_ab") == brute,
      s"top pair ($ta,$tb): engine ${top.getAs[Long]("n_ab")} != brute $brute")
  }
}
