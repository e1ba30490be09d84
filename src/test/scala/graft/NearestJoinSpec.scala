package graft

import org.apache.spark.sql.functions._
import graft.ops.NearestJoin

/** Tolerance-bounded nearest-neighbor join: boundary inclusion, tie-break
  * determinism, unmatched-row preservation, and banding completeness.
  */
class NearestJoinSpec extends SparkSpec {

  private def run(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)],
                  tol: Long) = {
    import spark.implicits._
    val l = left.toDF("lid", "k", "lt")
    val r = right.toDF("rid", "k", "rt")
    NearestJoin.nearest(l, "lid", "lt", r, "rid", "rt", "k", tol)
      .select("lid", "nearest_id", "dist")
      .collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some((x.getLong(1), x.getLong(2)))))
      .toMap
  }

  test("picks the closest; exactly-at-tolerance matches; beyond it does not") {
    val out = run(
      left = Seq((1L, 7L, 1000L), (2L, 7L, 5000L)),
      right = Seq((10L, 7L, 920L), (11L, 7L, 1100L), (12L, 7L, 5900L)),
      tol = 900L)
    assert(out(1L).contains((10L, 80L)), "80 beats 100 in either direction")
    assert(out(2L).contains((12L, 900L)), "dist == tolerance is a match")
    val far = run(Seq((1L, 7L, 1000L)), Seq((10L, 7L, 1901L)), tol = 900L)
    assert(far(1L).isEmpty, "dist 901 > tolerance 900 is not a match")
  }

  test("equidistant tie breaks toward earlier right time, then smaller id") {
    val out = run(
      left = Seq((1L, 7L, 1000L)),
      right = Seq((11L, 7L, 1100L), (10L, 7L, 900L)),
      tol = 900L)
    assert(out(1L).contains((10L, 100L)), "earlier right time wins the tie")
    val sameT = run(
      left = Seq((1L, 7L, 1000L)),
      right = Seq((12L, 7L, 900L), (11L, 7L, 900L)),
      tol = 900L)
    assert(sameT(1L).contains((11L, 100L)), "same time: smaller id wins")
  }

  test("keys never cross; unmatched left rows survive with nulls") {
    val out = run(
      left = Seq((1L, 7L, 1000L), (2L, 8L, 1000L)),
      right = Seq((10L, 9L, 1000L)),
      tol = 900L)
    assert(out == Map(1L -> None, 2L -> None))
  }

  test("banding is complete: every in-tolerance pair found across bucket edges") {
    // right times straddle bucket boundaries of width=tol around each left
    val tol = 100L
    val rnd = new scala.util.Random(7)
    val left = (1L to 50L).map(i => (i, 1L, rnd.nextInt(2000).toLong))
    val right = (100L to 160L).map(i => (i, 1L, rnd.nextInt(2000).toLong))
    val got = run(left, right, tol)
    val exp = left.map { case (lid, _, lt) =>
      val cands = right.map { case (rid, _, rt) => (math.abs(lt - rt), rt, rid) }
        .filter(_._1 <= tol)
      lid -> cands.sorted.headOption.map(c => (c._3, c._1))
    }.toMap
    assert(got == exp)
  }
}
