package graft

/** Cluster-balanced resampling: per-cluster cap and determinism. */
class SampleBalanceSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("sample_cluster_balanced: keeps exactly min(n, ceil(sqrt(n))) per cluster; singletons all kept") {
    val rows = SparkEntry.queries("sample_cluster_balanced")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("cluster_id")).foreach { case (c, rs) =>
      val n = rs.length.toLong
      assert(rs.forall(_.getAs[Long]("n_members") == n), s"cluster $c n_members")
      val target = math.ceil(math.sqrt(n.toDouble)).toLong
      assert(rs.forall(_.getAs[Long]("target") == target))
      val kept = rs.count(_.getAs[Boolean]("keep"))
      assert(kept == math.min(n, target),
        s"cluster $c (n=$n) keeps $kept, expected ${math.min(n, target)}")
      if (n == 1) assert(kept == 1, "singletons survive flattening")
      // ranks are a permutation of 1..n — the reservoir-family hash rank
      assert(rs.map(_.getAs[Long]("rnk")).sorted.sameElements(1L to n))
    }
    // the flattening only ever bites head clusters: total kept <= total
    val total = rows.length
    val kept = rows.count(_.getAs[Boolean]("keep"))
    assert(kept <= total && kept > 0)
  }

  test("sample_cluster_balanced is deterministic across runs") {
    val a = SparkEntry.queries("sample_cluster_balanced")(spark, d).collect()
    val b = SparkEntry.queries("sample_cluster_balanced")(spark, d).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
  }
}
