package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.IntMath

/** Banded (bucketed) interval join: match points `p` against ranges
  * `[lo, hi)` WITHOUT a BroadcastNestedLoopJoin.
  *
  * A raw `points.join(ranges, pt >= lo && pt < hi)` has no equi-key, so
  * Spark plans a nested-loop join — broadcast-bounded on one side and
  * O(|points|·|ranges|) in compares. The banded shape restores an equi-key:
  * quantize the domain into fixed-width buckets, explode each range into
  * the buckets it covers, key each point by its own bucket, then equi-join
  * on the bucket id and re-check the precise predicate. Each point lives in
  * exactly one bucket and a range contributes one row per covered bucket,
  * so no pair can match twice — no DISTINCT needed afterwards.
  *
  * Scale posture: this is a plain shuffle hash/sort-merge join on a LONG
  * key. Cost is |points| + Σ_ranges ceil(span/width) shuffle rows; pick
  * `bucketWidth` near the typical range span so most ranges land in 1–2
  * buckets. Hot buckets (many ranges covering the same bucket) are ordinary
  * join skew, handled by AQE skew-join splitting — never a driver ceiling.
  * Same pattern at any scale; 100× more data is 100× more bucket rows, not
  * a quadratic product.
  */
object RangeJoin {

  /** Join each row of `points` to every row of `ranges` whose
    * `[loCol, hiCol)` interval contains `ptCol` (half-open, integer
    * domain, e.g. epoch micros). Output carries all columns of both inputs.
    */
  def pointInRange(points: DataFrame, ptCol: String,
                   ranges: DataFrame, loCol: String, hiCol: String,
                   bucketWidth: Long): DataFrame =
    pointInRangeKeyed(points, ptCol, ranges, loCol, hiCol, bucketWidth, Nil)

  /** [[pointInRange]] with equality key columns (present on BOTH inputs,
    * e.g. user_id): the equi-join key becomes `keys :+ bucket`, so bucket
    * collisions across different key values never meet — the per-entity
    * attribution/windowing shape. Keys are emitted once (join-using).
    */
  def pointInRangeKeyed(points: DataFrame, ptCol: String,
                        ranges: DataFrame, loCol: String, hiCol: String,
                        bucketWidth: Long, keys: Seq[String]): DataFrame = {
    // Empty/inverted ranges (hi <= lo) are dropped BEFORE the explode:
    // they can never match the half-open predicate, and Spark's
    // sequence(start, stop) auto-reverses for start > stop — a single
    // corrupt range row would otherwise explode into floor(lo/w)+1
    // spurious bucket rows (unbounded amplification the residual filter
    // then pays to discard).
    // last covered bucket: floorDiv(hi - 1, w) — hi itself is exclusive.
    // IntMath.floorDiv, not floor(col / w): double division mis-buckets
    // |values| >= 2^53 (epoch-nanos domain) and silently drops matches.
    val r = ranges.filter(col(hiCol) > col(loCol)).withColumn("__bkt",
      explode(sequence(IntMath.floorDiv(col(loCol), bucketWidth),
        IntMath.floorDiv(col(hiCol) - 1, bucketWidth))))
    val p = points.withColumn("__bkt", IntMath.floorDiv(col(ptCol), bucketWidth))
    if (keys.isEmpty)
      p.join(r, p("__bkt") === r("__bkt") &&
          col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
        .drop("__bkt")
    else
      p.join(r, keys :+ "__bkt")
        .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
        .drop("__bkt")
  }
}
