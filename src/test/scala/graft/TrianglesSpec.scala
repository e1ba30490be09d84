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

  test("graph_components: labeling equals a driver-side union-find replay") {
    val d = "/root/testdata/sf0.001"
    val labeled = SparkEntry.queries("graph_components")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labeled.nonEmpty, "sf0.001 has support-3 co-purchase edges")
    // rebuild the same support-filtered edge set and union-find it
    val li = Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairs = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.size; if ps(i) != ps(j))
        yield (ps(i), ps(j))
    }.groupBy(identity)
      // iterator first: collect-ing (a,b) tuples out of a Map would build
      // a Map again and silently collapse all edges sharing a first node
      .iterator.collect { case (p, xs) if xs.size >= 3 => p }.toSeq
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- pairs) parent(find(a)) = find(b)
    val members = pairs.flatMap { case (a, b) => Seq(a, b) }.distinct
    val byRoot = members.groupBy(find)
    val expected = byRoot.values.flatMap { ms =>
      val root = ms.min; ms.map(_ -> root)
    }.toMap
    assert(labeled == expected,
      s"missing=${(expected.toSet -- labeled.toSet).take(5)} " +
        s"extra=${(labeled.toSet -- expected.toSet).take(5)}")
  }

  test("global clustering coefficient: 3T/W on a hand graph (triangle + tail)") {
    // triangle {1,2,3} + pendant 3-4: degrees 2,2,3,1 → wedges = 1+1+3+0 = 5,
    // T = 1 → cc = 3/5 = 600000 ppm. Replays the graph_clustering
    // composition (degree frame + perNode) on a synthetic canon frame.
    val canon = Triangles.canonical(
      edgeDf(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))), "src", "dst")
    val deg = canon.select(col("a").as("node"))
      .unionAll(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).cast("decimal(38,0)").as("deg"))
    val w2 = deg.agg(sum(col("deg") * (col("deg") - 1)).as("w2"))
      .head().getDecimal(0).longValueExact()
    val tri3 = Triangles.perNode(canon)
      .agg(coalesce(sum(col("tri_count")), lit(0L))).head().getLong(0)
    assert(w2 == 10L && tri3 == 3L, s"w2=$w2 tri3=$tri3")
    assert(tri3 * 2000000L / w2 == 600000L)
  }
}
