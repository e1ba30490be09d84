package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.IntMath

/** Banded interval×interval OVERLAP join — the two-sided sibling of
  * [[RangeJoin]]: match every pair of intervals `a=[a_lo, a_hi)`,
  * `b=[b_lo, b_hi)` with `a_lo < b_hi && b_lo < a_hi`, without a
  * nested-loop join and without a DISTINCT.
  *
  * Both sides explode into the fixed-width buckets they cover, the join
  * is an equi-join on the bucket id, and each overlapping pair is
  * CLAIMED by exactly one bucket — the one containing the overlap's
  * start `max(a_lo, b_lo)`. An overlapping pair shares that bucket by
  * construction (both intervals cover the overlap start), so the
  * responsibility filter keeps the pair exactly once and drops its
  * duplicates in every other shared bucket. No post-join dedup, which at
  * 100 TB matters: DISTINCT over the pair set would be a second full
  * shuffle of the (larger) join output.
  *
  * Cost: Σ ceil(span/width) exploded rows per side, then a LONG-key
  * shuffle join — linear in data for a width near the typical span. Hot
  * buckets are ordinary join skew (AQE splits them); a pathological
  * wide interval contributes span/width rows, never a cross product.
  */
object IntervalJoin {

  /** Overlap-join two interval frames (half-open integer bounds, e.g.
    * epoch micros). Output: all columns of both inputs plus
    * `overlap_len = min(a_hi,b_hi) - max(a_lo,b_lo)`.
    */
  def overlapJoin(a: DataFrame, aLo: String, aHi: String,
                  b: DataFrame, bLo: String, bHi: String,
                  bucketWidth: Long): DataFrame = {
    // drop empty/inverted intervals pre-explode (same guard as RangeJoin:
    // sequence() auto-reverses and would amplify corrupt rows)
    def burst(f: DataFrame, lo: String, hi: String, tag: String) =
      f.filter(col(hi) > col(lo)).withColumn(tag,
        explode(sequence(IntMath.floorDiv(col(lo), bucketWidth),
          IntMath.floorDiv(col(hi) - 1, bucketWidth))))
    val ax = burst(a, aLo, aHi, "__abkt")
    val bx = burst(b, bLo, bHi, "__bbkt")
    val overlapStart = greatest(col(aLo), col(bLo))
    ax.join(bx,
        col("__abkt") === col("__bbkt") &&
          col(aLo) < col(bHi) && col(bLo) < col(aHi) &&
          col("__abkt") === IntMath.floorDiv(overlapStart, bucketWidth))
      .withColumn("overlap_len", least(col(aHi), col(bHi)) - overlapStart)
      .drop("__abkt", "__bbkt")
  }
}
