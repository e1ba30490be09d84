package graft

import graft.ops.Lpa

/** Structural contracts of the deterministic synchronous LPA: community
  * separation on planted structure, tie determinism, label invariants.
  */
class LpaSpec extends SparkSpec {

  import spark.implicits._

  private def pairs(ps: (Long, Long)*) =
    ps.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("a", "b")

  /** Two 4-cliques joined by one bridge edge. */
  private val twoCliques = pairs(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (11L, 12L), (11L, 13L), (11L, 14L), (12L, 13L), (12L, 14L), (13L, 14L),
    (4L, 11L))

  test("planted cliques: each clique converges to one label, bridge does not merge them") {
    val m = Lpa.run(twoCliques, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c1 = Seq(1L, 2L, 3L, 4L).map(m)
    val c2 = Seq(11L, 12L, 13L, 14L).map(m)
    assert(c1.distinct.length == 1, s"clique 1 split: $c1")
    assert(c2.distinct.length == 1, s"clique 2 split: $c2")
    assert(c1.head != c2.head, "bridge edge merged the two cliques")
  }

  test("labels are node ids from the same graph (min-tie-break bias)") {
    val lbl = Lpa.run(twoCliques, iters = 4).collect().map(_.getLong(1)).toSet
    val nodes = (1L to 4L).toSet ++ (11L to 14L).toSet
    assert(lbl.subsetOf(nodes))
  }

  test("deterministic: two runs agree row-for-row") {
    def snap() = Lpa.run(twoCliques, iters = 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(snap() == snap())
  }

  test("isolated edge pair: both ends take the smaller id") {
    val m = Lpa.run(pairs((7L, 9L)), iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(7L -> 7L, 9L -> 7L))
  }

  test("every node appears exactly once") {
    val rows = Lpa.run(twoCliques, iters = 4).collect()
    assert(rows.length == 8)
    assert(rows.map(_.getLong(0)).distinct.length == 8)
  }

  test("graph_lpa labels refine graph_components on the fixture") {
    val d = "/root/testdata/sf0.001"
    val lpa = SparkEntry.queries("graph_lpa")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cc = SparkEntry.queries("graph_components")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lpa.keySet == cc.keySet, "same node universe")
    // LPA never merges across components: same LPA label ⇒ same component
    lpa.groupBy(_._2).values.foreach { grp =>
      assert(grp.keys.map(cc).toSet.size == 1,
        "an LPA community crossed a connected component")
    }
  }

  test("graph_modularity: invariants of the per-community Q terms") {
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("graph_modularity")(spark, d).collect()
    assert(rows.nonEmpty)
    val m = SparkEntry.queries("graph_lpa")(spark, d).count() // nodes, not edges
    rows.foreach { r =>
      val (n, degSum, eIn, q) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n >= 1 && degSum >= n, s"degree sum $degSum under node count $n")
      assert(eIn >= 0 && 2 * eIn <= degSum,
        "internal edges contribute 2 degree ends each")
      assert(q > -1000000 && q < 1000000, s"q_ppm $q outside (-1e6, 1e6)")
    }
    // node conservation: community sizes sum to the node universe
    assert(rows.map(_.getLong(1)).sum == m)
  }
}
