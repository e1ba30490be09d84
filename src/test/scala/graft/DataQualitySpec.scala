package graft

import org.apache.spark.sql.functions._

/** Batch-D contracts: suppression-gated release, winsorized stats,
  * data-contract checks, degree distribution.
  */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("k_anonymity_release: suppressed cells never leak size or balance") {
    val rel = SparkEntry.queries("k_anonymity_release")(spark, d).collect()
    assert(rel.nonEmpty)
    for (r <- rel) {
      if (r.getAs[Int]("released") == 0) {
        assert(r.getAs[Long]("n_out") == -1L)
        assert(r.getAs[Long]("bal_cents") == -1L)
      } else assert(r.getAs[Long]("n_out") >= 5L)
    }
    // released cells must account exactly: re-aggregate and compare
    val truth = Tables.customer(spark, d)
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("k"),
        sum(expr("CAST(round(c_acctbal * 100) AS DECIMAL(38,0))")).as("b"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1)) -> (r.getLong(2), r.getDecimal(3).longValue()))
      .toMap
    for (r <- rel if r.getAs[Int]("released") == 1) {
      val (k, b) = truth((r.getAs[Int]("c_nationkey"), r.getAs[String]("c_mktsegment")))
      assert(r.getAs[Long]("n_out") == k && r.getAs[Long]("bal_cents") == b)
    }
  }

  test("agg_winsorized: clamped mean sits within [lo, hi] and differs from raw on tails") {
    val w = SparkEntry.queries("agg_winsorized")(spark, d).collect()
    assert(w.nonEmpty)
    for (r <- w) {
      val (lo, hi) = (r.getAs[Long]("lo_cents"), r.getAs[Long]("hi_cents"))
      assert(lo <= hi)
      val mean = r.getAs[Long]("wmean_milli")
      assert(mean >= lo * 1000 - 1000 && mean <= hi * 1000 + 1000,
        "winsorized mean must lie inside the clamp range")
      assert(r.getAs[Long]("wsum_cents") <= hi * r.getAs[Long]("n"))
      assert(r.getAs[Long]("wsum_cents") >= lo * r.getAs[Long]("n"))
    }
  }

  test("dq_report: clean fixture reports zero violations; planted dirt is caught") {
    val rep = SparkEntry.queries("dq_report")(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep.size == 5)
    assert(rep.values.forall(_ == 0L), s"fixture must be contract-clean: $rep")
    // detection power: the same checks on a dirty frame must fire. Orphan
    // check shape (left_anti + count) replayed on planted data:
    val facts = Seq((1L, 10L), (2L, 99L)).toDF("fk", "ref") // 99 is orphan
    val dims = Seq(10L).toDF("id")
    val orphans = facts.join(dims, facts("ref") === dims("id"), "left_anti").count()
    assert(orphans == 1L)
  }

  test("corpus_split: every doc in exactly one split; assignment is rerun-stable") {
    val rep = SparkEntry.queries("corpus_split")(spark, d).collect()
    assert(rep.map(_.getAs[String]("split")).toSet.subsetOf(Set("train", "val", "test")))
    assert(rep.map(_.getAs[Long]("n_docs")).sum == Tables.documents(spark, d).count())
    val again = SparkEntry.queries("corpus_split")(spark, d).collect()
    assert(rep.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq, "seeded gate must be rerun-stable")
    val train = rep.find(_.getAs[String]("split") == "train")
    assert(train.exists(_.getAs[Long]("n_docs") > 0), "90% slice must dominate")
  }

  test("split_leak_audit: exactly the cross-split subset of the verified near-dup pairs") {
    val leaks = SparkEntry.queries("split_leak_audit")(spark, d).collect()
    for (r <- leaks) assert(r.getAs[String]("split_a") != r.getAs[String]("split_b"))
    // audited pairs must be a subset of dedup_verified's is_dup pairs
    val dup = SparkEntry.queries("dedup_verified")(spark, d).collect()
      .filter(_.getAs[Boolean]("is_dup"))
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    for (r <- leaks)
      assert(dup((r.getAs[Long]("a"), r.getAs[Long]("b"))))
  }

  test("graph_degree_dist: histogram accounts for every co-purchase node once") {
    val dist = SparkEntry.queries("graph_degree_dist")(spark, d).collect()
    assert(dist.nonEmpty)
    val nNodes = dist.map(_.getAs[Long]("n_nodes")).sum
    val li = Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val nodes = li.as("l").join(li.as("r"),
        col("l.ok") === col("r.ok") && col("l.pk") =!= col("r.pk"))
      .select(col("l.pk")).distinct().count()
    assert(nNodes == nodes, "every node with ≥1 co-purchase edge appears once")
    assert(dist.forall(_.getAs[Long]("deg") >= 1L))
  }
}
