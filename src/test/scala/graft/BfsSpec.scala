package graft

import graft.ops.Bfs

class BfsSpec extends SparkSpec {
  import spark.implicits._

  // path graph 1-2-3-4-5-6 (+ isolated edge 98-99)
  private def canon = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
    (98L, 99L)).toDF("a", "b")
  private def src(ns: Long*) = ns.toSeq.toDF("node")

  test("layers: exact hop distances from a single source; unreachable stay out") {
    val out = Bfs.layers(canon, src(1L), maxHops = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L, 6L -> 5L))
  }

  test("layers: multi-source takes the minimum distance") {
    val out = Bfs.layers(canon, src(1L, 6L), maxHops = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 6L -> 0L, 2L -> 1L, 5L -> 1L, 3L -> 2L, 4L -> 2L))
  }

  test("layers: truncated budget reports converged = false") {
    val rows = Bfs.layers(canon, src(1L), maxHops = 2).collect()
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
      == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    assert(rows.forall(!_.getBoolean(2)), "frontier at hop 2 is non-empty")
    val full = Bfs.layers(canon, src(1L), maxHops = 5).collect()
    assert(full.forall(_.getBoolean(2)), "frontier empties exactly at budget")
  }

  test("layerHistogram: layer counts ordered by dist") {
    val out = Bfs.layerHistogram(canon, src(1L, 6L), maxHops = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq((0L, 2L, true), (1L, 2L, true), (2L, 2L, true)))
  }
}
