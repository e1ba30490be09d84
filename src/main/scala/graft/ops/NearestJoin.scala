package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expr.IntMath

/** Tolerance-bounded nearest-neighbor temporal join — pandas
  * `merge_asof(direction='nearest', tolerance=W)` semantics, made
  * deterministic and shuffle-bounded.
  *
  * `asof_signup` (backward as-of) answers "the latest right event at or
  * before t"; this answers "the CLOSEST right event within ±W of t" — the
  * sensor-fusion / clickstream-attribution shape where after-the-fact
  * events are legitimate matches and anything beyond the tolerance is
  * noise.
  *
  * Scale shape: the tolerance IS the band width. |lt − rt| ≤ W implies
  * floorDiv(lt, W) and floorDiv(rt, W) differ by at most 1, so each left
  * row probes exactly 3 buckets and each right row lives in exactly 1 —
  * the candidate join is an EQUI-join on (key, bucket), never a
  * BroadcastNestedLoopJoin, and 100× more data is 100× more bucket rows
  * ([[RangeJoin]] makes the same argument for intervals). The residual
  * |lt − rt| ≤ W filter discards the ≤2 spurious neighbor-bucket
  * candidates. The argmin window partitions by the LEFT ROW (key + left
  * id), whose frame is the per-row candidate list — bounded by event
  * density within ±W, never by corpus size.
  *
  * Ties (two right rows equidistant) break toward the earlier right time,
  * then the smaller right id — a total order, so the match is unique and
  * oracle-replayable.
  */
object NearestJoin {

  /** For each left row: the nearest right row with the same `key` within
    * `tolerance` of its time, or null columns if none. Output columns:
    * left's, plus `<rtAlias>` (matched right time), `<ridAlias>` (matched
    * right id), `dist` (|lt−rt|, null when unmatched).
    */
  def nearest(left: DataFrame, leftId: String, lt: String,
              right: DataFrame, rightId: String, rt: String,
              key: String, tolerance: Long,
              rtAlias: String = "nearest_t", ridAlias: String = "nearest_id"): DataFrame = {
    require(tolerance > 0, "tolerance must be positive")
    val lb = left.withColumn("__lb", IntMath.floorDiv(col(lt), tolerance))
      .withColumn("__bkt",
        explode(array(col("__lb") - 1, col("__lb"), col("__lb") + 1)))
      .drop("__lb")
    val rb = right.select(col(key), col(rightId).as(ridAlias), col(rt).as(rtAlias))
      .withColumn("__bkt", IntMath.floorDiv(col(rtAlias), tolerance))
    val cand = lb.join(rb, Seq(key, "__bkt"))
      .withColumn("dist", abs(col(lt) - col(rtAlias)))
      .filter(col("dist") <= tolerance)
    val w = Window.partitionBy(col(key), col(leftId))
      .orderBy(col("dist"), col(rtAlias), col(ridAlias))
    val best = cand.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(leftId), col(rtAlias), col(ridAlias), col("dist"))
    left.join(best, Seq(leftId), "left")
  }
}
