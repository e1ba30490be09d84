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

  test("layersPerSource: each seed keeps ITS OWN distances (no min-merge across seeds)") {
    val out = Bfs.layersPerSource(canon, src(1L, 6L), maxHops = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // from 1: 2@1 .. 6@5; from 6: 5@1 .. 1@5 — both full paths present
    assert(out((1L, 6L)) == 5L && out((6L, 1L)) == 5L)
    assert(out((1L, 3L)) == 2L && out((6L, 3L)) == 3L,
      "node 3 carries a DIFFERENT distance per seed")
    assert(out.size == 12, s"2 seeds x 6 path nodes: ${out.size}")
  }

  test("harmonic: exact micro sums on the path graph; radius bound; isolated seed reads 0") {
    // seed 1, maxHops 2: reaches 2@1, 3@2 -> 1e6 + 500000
    val h2 = Bfs.harmonic(canon, src(1L), maxHops = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(h2(1L) == ((2L, 1500000L)), s"$h2")
    // full radius: 1e6 + 500000 + 333333 + 250000 + 200000 = 2283333
    val h5 = Bfs.harmonic(canon, src(1L, 7L), maxHops = 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(h5(1L) == ((5L, 2283333L)), s"$h5")
    assert(h5(7L) == ((0L, 0L)), "a seed with no edges emits the 0 row")
  }

  test("layerHistogram: layer counts ordered by dist") {
    val out = Bfs.layerHistogram(canon, src(1L, 6L), maxHops = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq((0L, 2L, true), (1L, 2L, true), (2L, 2L, true)))
  }
}
