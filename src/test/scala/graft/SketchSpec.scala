package graft

import org.apache.spark.sql.functions._

/** Contracts of the self-verifying approximate keys: the oracle pins TRUE
  * verdicts, so these specs prove the verdicts MEAN something — the check
  * passes on the real sketch and fails on a corrupted one.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._
  private val d = "/root/testdata/sf0.001"

  test("agg_approx_percentile: rank-error verdicts hold on the fixture") {
    val rows = SparkEntry.queries("agg_approx_percentile")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3),
        s"GK sketch must meet its n/accuracy rank bound: $r")
    }
  }

  test("the rank check is falsifiable: a corrupted quantile fails it") {
    // replay the check with a deliberately wrong 'approx' value (the group
    // max) — the ok computation must reject it, proving TRUE isn't vacuous
    val li = Tables.lineitem(spark, d)
    val fake = li.groupBy("l_returnflag")
      .agg(max("l_quantity").as("ap50"), count(lit(1)).as("n"))
    val acc = 1000
    val checked = li.join(broadcast(fake), Seq("l_returnflag"))
      .groupBy("l_returnflag")
      .agg(max("n").as("n"),
        sum(when(col("l_quantity") < col("ap50"), 1L).otherwise(0L)).as("lt"),
        sum(when(col("l_quantity") <= col("ap50"), 1L).otherwise(0L)).as("le"))
      .select((col("lt") - (col("n") / acc + 1) <= col("n") * 0.5 &&
        col("n") * 0.5 <= col("le") + (col("n") / acc + 1)).as("ok"))
    assert(checked.collect().forall(!_.getBoolean(0)),
      "max-as-median must violate the p=0.5 rank bound")
  }

  test("agg_approx_percentile_sketch: one-pass production shape, values honor the rank bound") {
    val q = SparkEntry.queries("agg_approx_percentile_sketch")(spark, d)
    // production shape: exactly one scan, no verification join
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("FileScan")) == 1,
      s"sketch-only key must scan the fact table once:\n$plan")
    assert(!plan.contains("Join"), s"no verification join in the shipped shape:\n$plan")
    // round 5: the key self-verifies in-plan (exact band edges computed in
    // the SAME aggregate) and ships booleans — assert every verdict holds
    // and the counts are exact, then independently recompute the band from
    // the raw data to confirm the in-plan check is not vacuous: the exact
    // percentile band at p ± 2/acc must be non-degenerate on this fixture
    val rows = q.collect()
    assert(rows.nonEmpty)
    val byFlag = Tables.lineitem(spark, d)
      .select("l_returnflag", "l_quantity")
      .as[(String, Double)].collect().groupBy(_._1)
    rows.foreach { r =>
      val vals = byFlag(r.getString(0)).map(_._2).sorted
      assert(r.getLong(1) == vals.length, "group count must be exact")
      assert(r.getBoolean(2) && r.getBoolean(3),
        s"${r.getString(0)}: in-plan rank-band verdicts must hold")
      // band non-degeneracy: values at the +/- 2/acc rank edges differ from
      // the extreme of the data, so a grossly wrong sketch element (e.g.
      // the max) would fail the in-plan check — falsifiability
      val lo90 = vals(((0.9 - 0.002) * (vals.length - 1)).toInt)
      assert(vals.last > lo90 || vals.distinct.length == 1,
        "fixture must be able to falsify the p90 band")
    }
  }

  test("heavy_hitters: support floor is exact and complete") {
    val out = SparkEntry.queries("heavy_hitters")(spark, d)
      .as[(String, Long, Long)].collect()
    assert(out.nonEmpty)
    val freq = Tables.documents(spark, d)
      .select(explode(graft.llm.TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .as[(String, Long)].collect().toMap
    val tot = freq.values.sum
    val floor = 2000L
    out.foreach { case (t, f, ppm) =>
      assert(freq(t) == f && f * 1000000L >= floor * tot, s"$t below floor")
      assert(ppm == f * 1000000L / tot, s"$t ppm mismatch")
    }
    val missed = freq.filter { case (t, f) =>
      f * 1000000L >= floor * tot && !out.exists(_._1 == t)
    }
    assert(missed.isEmpty, s"tokens above the floor missing from output: $missed")
  }

  test("sketch_countmin: estimates equal a driver-side sketch replay and never undercount") {
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("sketch_countmin")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 20)
    // CM's one-sided error: the estimate can never undercount
    rows.foreach { case (t, tru, est, over) =>
      assert(est >= tru && over == est - tru, s"$t: est=$est true=$tru")
    }
    // full driver-side replay of the sketch with the same hash family
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val toks = Tables.documents(spark, d)
      .select(explode(graft.llm.TextAnalysis.tokens(col("text"))).as("t"))
      .as[String].collect()
    val (depth, width) = (4, 256L)
    val counters = scala.collection.mutable.Map[(Int, Long), Long]()
    for (t <- toks; i <- 0 until depth) {
      val cell = graft.expr.PortableHash.phashLocal(s"$i:$t") % width
      counters((i, cell)) = counters.getOrElse((i, cell), 0L) + 1L
    }
    val exact = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { case (t, tru, est, _) =>
      assert(tru == exact(t), s"$t exact count mismatch")
      val replay = (0 until depth).map { i =>
        counters((i, graft.expr.PortableHash.phashLocal(s"$i:$t") % width))
      }.min
      assert(est == replay, s"$t: engine est=$est replay=$replay")
    }
  }
}
