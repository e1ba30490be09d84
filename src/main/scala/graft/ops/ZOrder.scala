package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: interleave the bits of two 16-bit grid
  * coordinates into one 32-bit sort key, so that sorting by the key keeps
  * spatially-close rows close in file order — the clustering step behind
  * multi-dimensional data skipping (Delta/Iceberg `OPTIMIZE ZORDER BY`):
  * files written in z order carry tight per-file min/max ranges on BOTH
  * dimensions, so a reader filtering on either column prunes most files.
  *
  * Everything is closed-form integer bit math (shift/mask spreading, the
  * classic "magic numbers" construction), expressible identically as Spark
  * `Column` ops and DuckDB SQL — whole-stage codegen on the engine side,
  * bit-for-bit replayable on the oracle side.
  *
  * Scale posture: the z key is a narrow per-row projection (no shuffle);
  * the layout itself is ONE `repartitionByRange` on the key (range
  * partitioner = distributed sort, the same machinery as any global sort)
  * followed by an in-partition sort — exactly how a 1000-executor cluster
  * lays out 100 TB, with file count = partition count.
  */
object ZOrder {

  /** The magic-number spreading schedule — the ONE copy of the constants
    * every representation (Column, DuckDB SQL, SQL-surface Expression,
    * local reference) derives from, so the encodings cannot drift.
    */
  val SpreadSteps: Seq[(Int, Long)] =
    Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))
  val InputMask = 0xFFFFL

  /** Spread the low 16 bits of `v` to even bit positions (0,2,4,…,30). */
  private def spread16(v: Column): Column =
    SpreadSteps.foldLeft(v.bitwiseAND(lit(InputMask))) { case (x, (sh, mask)) =>
      x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(mask))
    }

  private def sqlSpread16(e: String): String =
    SpreadSteps.foldLeft(s"(($e) & $InputMask)") { case (x, (sh, mask)) =>
      s"((($x | ($x << $sh)) & $mask))"
    }

  /** 32-bit Morton code of two 16-bit coords (x even bits, y odd bits). */
  def interleave(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  def sqlInterleave(xE: String, yE: String): String =
    s"(${sqlSpread16(xE)} | (${sqlSpread16(yE)} << 1))"

  /** Reference JVM implementation for property tests. */
  def interleaveLocal(x: Int, y: Int): Long = {
    def sp(v: Long): Long =
      SpreadSteps.foldLeft(v & InputMask) { case (r, (sh, mask)) =>
        (r | (r << sh)) & mask
      }
    sp(x.toLong) | (sp(y.toLong) << 1)
  }

  /** Quantize a double in [lo, hi] onto the 16-bit grid (clamped). */
  def quantize16(v: Column, lo: Double, hi: Double): Column =
    greatest(lit(0L), least(lit(65535L),
      floor((v - lit(lo)) / lit(hi - lo) * lit(65536.0)).cast("long")))

  def sqlQuantize16(e: String, lo: Double, hi: Double): String =
    s"greatest(0, least(65535, floor((($e) - $lo) / ${hi - lo} * 65536.0)::BIGINT))"

  /** Write-side layout: range-partition by the z key (distributed sort →
    * non-overlapping per-partition key ranges) and sort within partitions.
    * Each output partition/file then has tight min/max bounds on both
    * source dimensions — the property `ZOrderSpec` asserts.
    */
  def layout(df: DataFrame, zCol: String, numPartitions: Int): DataFrame =
    df.repartitionByRange(numPartitions, col(zCol)).sortWithinPartitions(zCol)
}
