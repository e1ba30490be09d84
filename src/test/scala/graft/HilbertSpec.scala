package graft

import org.apache.spark.sql.functions._
import graft.ops.{Hilbert, ZOrder}

class HilbertSpec extends SparkSpec {
  import spark.implicits._

  test("column path == local reference across random coords and orders") {
    val rnd = new scala.util.Random(17)
    for (order <- Seq(1, 2, 5, 16)) {
      val n = 1L << order
      val pts = Seq.tabulate(300)(i =>
        (i.toLong, math.abs(rnd.nextLong()) % n, math.abs(rnd.nextLong()) % n))
      val got = Hilbert.withIndex(pts.toDF("id", "x", "y"), "x", "y", order, "h")
        .select("id", "h").as[(Long, Long)].collect().toMap
      pts.foreach { case (id, x, y) =>
        assert(got(id) == Hilbert.indexLocal(x, y, order),
          s"order=$order ($x,$y): ${got(id)} != ${Hilbert.indexLocal(x, y, order)}")
      }
    }
  }

  test("the curve is a bijection with unit steps (the no-diagonal-jump property)") {
    // order 4: the full 16x16 grid. Indices must be a permutation of
    // 0..255 and consecutive indices must be 4-neighbors — the locality
    // property Z-order lacks (Morton jumps corners at power-of-two seams).
    val order = 4
    val n = 1 << order
    val byIndex = (for { x <- 0 until n; y <- 0 until n }
      yield Hilbert.indexLocal(x, y, order) -> (x, y)).sortBy(_._1)
    assert(byIndex.map(_._1) == (0L until (n.toLong * n)),
      "indices must be a permutation of the grid")
    byIndex.map(_._2).sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-unit step between consecutive indices: ($x1,$y1) -> ($x2,$y2)")
    }
    // contrast: Morton order DOES jump (so the assertion above is not vacuous)
    val zSteps = (for { x <- 0 until n; y <- 0 until n }
      yield ZOrder.interleaveLocal(x, y) -> (x, y)).sortBy(_._1).map(_._2)
    val zJumps = zSteps.sliding(2).count { case Seq((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1 }
    assert(zJumps > 0, "Morton order jumps; Hilbert must not")
  }

  test("hilbert_layout prefixes bound both dims at least as tightly as zorder_layout") {
    // Aggregate bounding-box area per 12-bit prefix bucket: the curve's
    // only job is locality, so the summed box area across buckets must
    // not be worse than Morton's on the same data.
    def area(key: String): Long =
      SparkEntry.queries(key)(spark, "/root/testdata/sf0.001")
        .select(((col("max_qx") - col("min_qx") + 1) *
          (col("max_qy") - col("min_qy") + 1)).as("a"))
        .agg(sum("a")).head().getLong(0)
    val hil = area("hilbert_layout")
    val zor = area("zorder_layout")
    assert(hil <= zor, s"hilbert total box area $hil must be <= zorder $zor")
  }
}
