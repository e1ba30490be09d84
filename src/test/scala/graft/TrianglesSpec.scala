package graft

import org.apache.spark.sql.functions._
import graft.ops.Triangles

/** Degree-oriented triangle counting: parity with brute-force enumeration,
  * exactly-once counting per triangle, and the hub-safety property the
  * orientation exists for.
  */
class TrianglesSpec extends SparkSpec {

  private def edgeDf(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  /** Brute-force per-node triangle counts on the driver. */
  private def brute(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.toSet
    val nodes = es.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val tris = for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      (a, b, c) = (nodes(i), nodes(j), nodes(k))
      if es((a, b)) && es((a, c)) && es((b, c))
    } yield Seq(a, b, c)
    tris.flatten.groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
  }

  private def run(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNode(Triangles.canonical(edgeDf(pairs), "src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("matches brute force on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(300)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    assert(run(pairs) == brute(pairs))
  }

  test("star graph has no triangles; closing one spoke pair makes exactly one") {
    val star = (1L to 10L).map(i => (0L, i))
    assert(run(star) == Map.empty)
    val closed = star :+ (1L, 2L)
    assert(run(closed) == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("triangle counted once regardless of input direction/duplication") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L), (1L, 1L))
    assert(run(messy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("orientation bounds hub fan-out: hub with max degree emits no wedges") {
    // A 50-spoke hub: naive wedge enumeration would build C(50,2)=1225
    // wedges at the hub; degree orientation points every edge INTO the hub,
    // so the oriented out-degree of the hub is 0.
    val pairs = (1L to 50L).map(i => (0L, i)) ++ Seq((1L, 2L))
    val canon = Triangles.canonical(edgeDf(pairs), "src", "dst")
    val deg = canon.select(col("a").as("n")).unionAll(canon.select(col("b").as("n")))
      .groupBy("n").count()
    val hubDeg = deg.filter(col("n") === 0L).head().getLong(1)
    assert(hubDeg == 50L)
    assert(run(pairs) == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("sf0.001 co-purchase graph: query runs and per-node counts are consistent") {
    val df = SparkEntry.queries("graph_triangles")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    // every participation count positive; total participation divisible by 3
    assert(rows.forall(_.getLong(1) > 0))
    assert(rows.map(_.getLong(1)).sum % 3 == 0)
  }
}
