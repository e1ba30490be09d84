package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.GlobalRank

/** ops.GlobalRank: the distributed global rank must equal the
  * single-partition window definition on hostile shapes — heavy ties
  * (single bucket absorbs half the data) and tiny inputs.
  */
class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  test("global row_number == window row_number on skewed, tied data") {
    val df = (Seq.fill(500)(5.0) ++ (1 to 500).map(_.toDouble))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      .repartition(7)
    val ranked = GlobalRank.withGlobalRowNumber(df, "v", Seq("id"), buckets = 8, out = "rn")
    val expected = df.withColumn("rn",
      row_number().over(Window.orderBy("v", "id")).cast("long"))
    assert(ranked.exceptAll(expected).isEmpty && expected.exceptAll(ranked).isEmpty,
      "distributed rank == window rank, bitwise")
  }

  test("derived input is materialized once: no recompute of the upstream subtree") {
    // an aggregate-derived frame: without auto-materialization the three
    // rank passes would each recompute the groupBy
    val base = (1 to 1000).map(i => (i.toLong % 97, i.toDouble)).toDF("k", "x")
    val derived = base.groupBy("k").agg(sum("x").as("v"))
    val ranked = GlobalRank.withGlobalRowNumber(derived, "v", Seq("k"), buckets = 8, out = "rn")
    val plan = ranked.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"),
      s"derived input must be checkpointed, not recomputed:\n$plan")
    assert(!plan.contains("HashAggregate"),
      s"upstream aggregate leaked into the ranked plan (recompute):\n$plan")
    // and the rank is still exact
    val expected = derived.withColumn("rn",
      row_number().over(Window.orderBy("v", "k")).cast("long"))
    assert(ranked.exceptAll(expected).isEmpty && expected.exceptAll(ranked).isEmpty)
  }

  test("bare-scan input is NOT checkpointed (pruned re-reads beat materializing the scan)") {
    val d = "/root/testdata/sf0.001"
    val orders = Tables.orders(spark, d).select(col("o_orderkey"), col("o_totalprice"))
    val ranked = GlobalRank.withGlobalRowNumber(
      orders, "o_totalprice", Seq("o_orderkey"), buckets = 8, out = "rn")
    val plan = ranked.queryExecution.executedPlan.toString
    assert(plan.contains("Scan parquet") && !plan.contains("ExistingRDD"),
      s"a project-over-scan input should stay a scan:\n$plan")
  }

  test("ntile edges: fewer rows than tiles; all-equal range keys") {
    val tiny = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v")
    val t = GlobalRank.withNtile(tiny, "v", Seq("id"), buckets = 4, tiles = 4, out = "q")
    assert(t.orderBy("id").select("q").collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3),
      "n < tiles: tile == rank (SQL ntile semantics)")

    // all keys equal: boundary bucketing degenerates to ONE bucket — ranks
    // must still come out exact through the tiebreak order
    val eq = (1L to 10L).map((_, 7.0)).toDF("id", "v")
    val e = GlobalRank.withNtile(eq, "v", Seq("id"), buckets = 4, tiles = 4, out = "q")
    assert(e.orderBy("id").select("q").collect().map(_.getInt(0)).toSeq ==
      Seq(1, 1, 1, 2, 2, 2, 3, 3, 4, 4), "10 rows over 4 tiles: 3/3/2/2 row-split")
  }

  test("grouped row_number == grouped window on skewed groups (one group holds 90%)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // heavy group 'big' (900 rows, many ties), small groups 'a'/'b'
    val rows = (0 until 900).map(i => ("big", i.toLong, (i % 7).toDouble)) ++
      (0 until 60).map(i => ("a", 1000L + i, (i % 5).toDouble)) ++
      (0 until 3).map(i => ("b", 2000L + i, i.toDouble))
    val df = rows.toDF("g", "id", "v")
    val got = GlobalRank
      .withGroupedRowNumber(df, "g", "v", Seq("id"), buckets = 8,
        out = "rnk", outN = "n_g")
      .select("g", "id", "rnk", "n_g")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
    val expect = df
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("n_g", count(lit(1)).over(Window.partitionBy("g")))
      .select("g", "id", "rnk", "n_g")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect, s"grouped distributed rank == grouped window")
  }

  test("grouped rank partitions by (group, bucket), spreading the heavy group") {
    import spark.implicits._
    val df = (0 until 500).map(i => ("big", i.toLong, i.toDouble)).toDF("g", "id", "v")
    val plan = GlobalRank
      .withGroupedRowNumber(df, "g", "v", Seq("id"), buckets = 8,
        out = "rnk", outN = "n_g")
      .queryExecution.executedPlan.toString
      .replaceAll("#\\d+L?", "")
    assert(plan.contains("windowspecdefinition(g, __bkt"),
      s"window must partition by (group, bucket), not group alone:\n$plan")
  }

  test("grouped rank: NULL group rows get real ranks, not case-chain defaults") {
    import spark.implicits._
    val rows = (0 until 40).map(i => (Option("a"), 100L + i, (i % 5).toDouble)) ++
      (0 until 7).map(i => (Option.empty[String], 200L + i, i.toDouble))
    val df = rows.toDF("g", "id", "v")
    val got = GlobalRank
      .withGroupedRowNumber(df, "g", "v", Seq("id"), buckets = 4,
        out = "rnk", outN = "n_g")
    val nulls = got.filter(col("g").isNull)
      .select("id", "rnk", "n_g").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(nulls.map(_._3).forall(_ == 7L),
      s"NULL group total must be 7, not the 0 default: ${nulls.toSeq}")
    assert(nulls.map(_._2).toSeq == (1L to 7L),
      s"NULL group ranks must be 1..7: ${nulls.toSeq}")
  }

  test("grouped rank falls back to a plain grouped window above MaxCaseGroups") {
    import spark.implicits._
    val df = (0 until 2000)
      .map(i => (s"g${i % 200}", i.toLong, (i % 13).toDouble)).toDF("g", "id", "v")
    val ranked = GlobalRank.withGroupedRowNumber(
      df, "g", "v", Seq("id"), buckets = 8, out = "rnk", outN = "n_g")
    val plan = ranked.queryExecution.executedPlan.toString.replaceAll("#\\d+L?", "")
    assert(!plan.contains("__bkt"),
      s"200 groups > MaxCaseGroups must use the plain grouped window, no bucket chain:\n$plan")
    val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
    val expect = df
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("n_g", count(lit(1)).over(Window.partitionBy("g")))
    assert(ranked.exceptAll(expect).isEmpty && expect.exceptAll(ranked).isEmpty,
      "fallback path must be value-identical to the grouped window")
  }

  test("many-group Zipf-head input routes through the sub-bucketed rank, value-identical") {
    import spark.implicits._
    // 200 groups (> MaxCaseGroups) with one mega-group holding ~70% of rows
    // — the regime the round-10 verdict flagged. maxGroupRows is forced
    // tiny so the fixture-sized fixture trips the same gate a 100-TB head
    // domain would. Ties in v land across bucket boundaries on purpose.
    val rows = (0 until 1400).map(i => ("hub", i.toLong, (i % 11).toDouble)) ++
      (0 until 600).map(i => (s"g${i % 199}", 10000L + i, (i % 7).toDouble))
    val df = rows.toDF("g", "id", "v")
    val ranked = GlobalRank.withGroupedRowNumber(
      df, "g", "v", Seq("id"), buckets = 8, out = "rnk", outN = "n_g",
      maxGroupRows = 100L)
    val plan = ranked.queryExecution.executedPlan.toString.replaceAll("#\\d+L?", "")
    assert(plan.contains("windowspecdefinition(g, __bkt"),
      s"head-group input must rank per (group, bucket), not per group:\n$plan")
    val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
    val expect = df
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("n_g", count(lit(1)).over(Window.partitionBy("g")))
    assert(ranked.exceptAll(expect).isEmpty && expect.exceptAll(ranked).isEmpty,
      "sub-bucketed many-group rank must be value-identical to the grouped window")
  }

  test("many-group balanced input keeps the one-pass grouped window (skew gate holds)") {
    import spark.implicits._
    val df = (0 until 2000)
      .map(i => (s"g${i % 200}", i.toLong, (i % 13).toDouble)).toDF("g", "id", "v")
    val ranked = GlobalRank.withGroupedRowNumber(
      df, "g", "v", Seq("id"), buckets = 8, out = "rnk", outN = "n_g",
      maxGroupRows = 100L) // 10 rows/group — well under the gate
    val plan = ranked.queryExecution.executedPlan.toString.replaceAll("#\\d+L?", "")
    assert(!plan.contains("__bkt"),
      s"balanced 200-group input must keep the plain grouped window:\n$plan")
  }

  test("export_interleave: positions are a permutation and no source ever runs long") {
    val out = SparkEntry.queries("export_interleave")(spark, "/root/testdata/sf0.001")
      .collect()
    val n = out.length
    assert(n > 0)
    assert(out.map(_.getAs[Long]("pos")).sorted.toSeq == (1L to n).toSeq,
      "pos must be an exact 1..N permutation")
    // Round-robin property: between a source's rank-r and rank-(r+1) docs
    // sit at most one doc of each OTHER source (rank-r docs of later
    // sources + rank-(r+1) docs of earlier ones) — so consecutive
    // positions of one source can differ by at most the source count.
    val bySource = out.groupBy(_.getAs[String]("source"))
    val nSrc = bySource.size.toLong
    assert(nSrc > 1, "fixture must have several sources for the property to bite")
    for ((src, rows) <- bySource) {
      val ps = rows.map(_.getAs[Long]("pos")).sorted
      val maxGap = ps.zip(ps.tail).map { case (a, b) => b - a }
        .foldLeft(0L)(math.max)
      assert(maxGap <= nSrc, s"source $src runs: max gap $maxGap > $nSrc sources")
    }
  }

  test("autoBuckets: clamped ceiling of n / RowsPerBucket") {
    assert(GlobalRank.autoBuckets(0L) == GlobalRank.MinBuckets)
    assert(GlobalRank.autoBuckets(600000L) == GlobalRank.MinBuckets)
    assert(GlobalRank.autoBuckets(32L * GlobalRank.RowsPerBucket) == 32)
    assert(GlobalRank.autoBuckets(32L * GlobalRank.RowsPerBucket + 1) == 33)
    assert(GlobalRank.autoBuckets(100L * GlobalRank.RowsPerBucket) == 100)
    assert(GlobalRank.autoBuckets(Long.MaxValue) == GlobalRank.MaxBuckets)
  }

  test("bucket count never changes the output: 2 / 8 / 200 / Auto are value-identical") {
    // bucket boundaries are monotone cuts of one total order, so the count
    // is a pure parallelism knob — the contract that lets Auto replace the
    // pinned 32 at every call site with zero oracle churn (round-9 verdict
    // task #1). 200 > ChainMax also exercises the array-literal bucket-id
    // and element_at offset forms (5000 distinct keys → ~199 live bounds).
    val df = (1 to 5000).map(i => (i.toLong, ((i * 7919) % 5000).toDouble))
      .toDF("id", "v").repartition(7)
    val expected = df.withColumn("rn",
      row_number().over(Window.orderBy("v", "id")).cast("long"))
    for (b <- Seq(2, 8, 200, GlobalRank.Auto)) {
      val ranked = GlobalRank.withGlobalRowNumber(df, "v", Seq("id"), buckets = b, out = "rn")
      assert(ranked.exceptAll(expected).isEmpty && expected.exceptAll(ranked).isEmpty,
        s"buckets=$b must be value-identical to the window rank")
    }
  }

  test("prefix sum is bucket-count-invariant too, including the >ChainMax array path") {
    val df = (1 to 3000).map(i => (i.toLong, ((i * 31) % 500).toLong, (i % 11 + 1).toLong))
      .toDF("id", "k", "sz").repartition(5)
    val want = df.withColumn("cum",
      sum("sz").over(Window.orderBy("k", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    for (b <- Seq(3, 150, GlobalRank.Auto)) {
      val got = GlobalRank.withGlobalPrefixSum(df, "k", Seq("id"), "sz", buckets = b, out = "cum")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"buckets=$b prefix sum must equal the window cumsum")
    }
  }

  test("grouped rank: Auto and explicit bucket counts agree") {
    val rows = (0 until 400).map(i => ("big", i.toLong, (i % 7).toDouble)) ++
      (0 until 30).map(i => ("a", 1000L + i, (i % 5).toDouble))
    val df = rows.toDF("g", "id", "v")
    val auto = GlobalRank.withGroupedRowNumber(df, "g", "v", Seq("id"),
      buckets = GlobalRank.Auto, out = "rnk", outN = "n_g")
    val pinned = GlobalRank.withGroupedRowNumber(df, "g", "v", Seq("id"),
      buckets = 8, out = "rnk", outN = "n_g")
    assert(auto.exceptAll(pinned).isEmpty && pinned.exceptAll(auto).isEmpty,
      "grouped Auto must be value-identical to a pinned count")
  }

  test("global prefix sum == single-partition window cumsum on skewed, tied data") {
    // heavy ties on the range key: half the rows share one key, so one
    // bucket absorbs them — the offset table must still stitch exactly
    val df = (Seq.fill(400)(7L) ++ (1L to 400L))
      .zipWithIndex.map { case (v, i) => (i.toLong, v, (i % 13 + 1).toLong) }
      .toDF("id", "k", "sz")
      .repartition(7)
    val got = GlobalRank.withGlobalPrefixSum(
      df, "k", Seq("id"), "sz", buckets = 8, out = "cum")
    val want = df.withColumn("cum",
      sum("sz").over(Window.orderBy("k", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "distributed prefix sum == window cumsum, bitwise")
  }

  test("prefix sum on a derived (non-bare-scan) input stays correct") {
    val base = (1 to 900).map(i => (i.toLong % 31, i.toLong)).toDF("g", "x")
    val derived = base.groupBy("g").agg(sum("x").as("sz"))
    val got = GlobalRank.withGlobalPrefixSum(
      derived, "g", Seq.empty, "sz", buckets = 4, out = "cum")
    val want = derived.withColumn("cum",
      sum("sz").over(Window.orderBy("g")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
