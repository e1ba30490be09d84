package graft

/** mix_temperature_sweep: α-grid invariants against the single-α keys. */
class MixSweepSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("sweep: α=1 keeps everything, α=1/2 row-matches mix_temperature, shares sum to ~1e6") {
    val rows = SparkEntry.queries("mix_temperature_sweep")(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val langs = rows.keys.map(_._2).toSet
    assert(rows.size == 4 * langs.size, "one row per (alpha, lang)")
    // α = 1: target = own mass -> every language keeps 100%
    langs.foreach { l => assert(rows((1000000L, l))._4 == 1000000L, s"α=1 $l") }
    // α = 1/2 agrees with the standalone mix_temperature key row-for-row
    val single = SparkEntry.queries("mix_temperature")(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(5)))).toMap
    langs.foreach { l =>
      val (_, w, share, rate) = rows((500000L, l))
      assert((w, rate) == ((single(l)._1, single(l)._2)), s"α=1/2 $l diverges")
      assert(share <= 1000000L)
    }
    // per-α share mass: floored ppm shares sum to 1e6 - (#langs truncation)
    Seq(0L, 250000L, 500000L, 1000000L).foreach { a =>
      val s = langs.toSeq.map(l => rows((a, l))._3).sum
      assert(s <= 1000000L && s > 1000000L - langs.size - 1,
        s"α=$a shares sum $s")
    }
    // temperature monotonicity: the HEAD language's share grows with α,
    // the tail language's shrinks
    val mass = langs.toSeq.map(l => l -> rows((1000000L, l))._1).sortBy(_._2)
    val (tail, head) = (mass.head._1, mass.last._1)
    val headShares = Seq(0L, 250000L, 500000L, 1000000L).map(a => rows((a, head))._3)
    assert(headShares.zip(headShares.tail).forall { case (x, y) => x <= y },
      s"head share monotone in α: $headShares")
    val tailShares = Seq(0L, 250000L, 500000L, 1000000L).map(a => rows((a, tail))._3)
    assert(tailShares.zip(tailShares.tail).forall { case (x, y) => x >= y },
      s"tail share anti-monotone in α: $tailShares")
  }
}
