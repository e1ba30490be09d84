package graft

import org.apache.spark.sql.functions._
import graft.ops.{KCore, Triangles}

/** ops.KCore + l_diversity: the fixed-round peel must equal the true
  * fixpoint core (verified against a driver-side reference peel on the
  * collected fixture graph), and the diversity audit must account for
  * every row.
  */
class KCoreSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def canonEdges = {
    val li = Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct().localCheckpoint()
    val edges = li.as("l").join(li.as("r"),
        col("l.ok") === col("r.ok") && col("l.pk") < col("r.pk"))
      .select(col("l.pk").as("src"), col("r.pk").as("dst"))
    Triangles.canonical(edges, "src", "dst").localCheckpoint()
  }

  /** Reference peel to the true fixpoint on the collected edge list. */
  private def referenceCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    var es = edges
    var changed = true
    while (changed) {
      val deg = es.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= k).keySet
      val next = es.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != es.size
      es = next
    }
    es.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map { case (n, xs) => n -> xs.size }
      .filter(_._2 >= k)
  }

  test("graph_kcore == the true fixpoint core on the fixture, and reports convergence") {
    val got = SparkEntry.queries("graph_kcore")(spark, d).collect()
    val edges = canonEdges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = referenceCore(edges, 8)
    assert(got.map(r => r.getAs[Long]("node") -> r.getAs[Long]("deg").toInt).toMap == want,
      "fixed-round peel must reach the true fixpoint on the fixture")
    assert(got.forall(_.getAs[Boolean]("converged")),
      "the round budget must be proven sufficient, not assumed")
    assert(got.forall(_.getAs[Long]("deg") >= 8L))
  }

  test("kcore: converged=false when the budget is deliberately too small") {
    // one peel round on a long chain graph: needs length-many rounds
    import spark.implicits._
    val chain = (1L to 30L).map(i => (i, i + 1)).toDF("a", "b")
    val out = KCore.core(chain, k = 2, rounds = 1).collect()
    // after one round only the endpoints are gone; not yet a fixpoint
    assert(out.nonEmpty && out.forall(!_.getAs[Boolean]("converged")))
    val full = KCore.core(chain, k = 2, rounds = 40).collect()
    assert(full.isEmpty, "a chain has no 2-core once peeled to fixpoint")
  }

  test("property: fixed-round peel == reference fixpoint on random graphs (when converged)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 20 + rnd.nextInt(20)
      val edges = (1 to n * 3).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      val df = edges.toDF("a", "b")
      val k = 2 + rnd.nextInt(3)
      val got = KCore.core(df, k, rounds = 30).collect()
      assert(got.forall(_.getAs[Boolean]("converged")),
        s"trial $trial: 30 rounds must converge on a ${n}-node graph")
      val want = referenceCore(edges, k)
      assert(got.map(r => r.getAs[Long]("node") -> r.getAs[Long]("deg").toInt).toMap == want,
        s"trial $trial (n=$n, k=$k)")
    }
  }

  test("l_diversity: histogram accounts for every customer; at_risk matches threshold") {
    val rep = SparkEntry.queries("l_diversity")(spark, d).collect()
    assert(rep.nonEmpty)
    assert(rep.map(_.getAs[Long]("n_users")).sum == Tables.customer(spark, d).count())
    for (r <- rep)
      assert((r.getAs[Long]("l_distinct") < 2L) == (r.getAs[Int]("at_risk") == 1))
  }
}
