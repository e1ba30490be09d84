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

  /** Spread the low 16 bits of `v` to even bit positions (0,2,4,…,30). */
  private def spread16(v: Column): Column = {
    var x = v.bitwiseAND(lit(0xFFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
  }

  private def sqlSpread16(e: String): String = {
    val s0 = s"(($e) & 65535)"
    val s1 = s"((($s0 | ($s0 << 8)) & 16711935))"
    val s2 = s"((($s1 | ($s1 << 4)) & 252645135))"
    val s3 = s"((($s2 | ($s2 << 2)) & 858993459))"
    s"(($s3 | ($s3 << 1)) & 1431655765)"
  }

  /** 32-bit Morton code of two 16-bit coords (x even bits, y odd bits). */
  def interleave(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  def sqlInterleave(xE: String, yE: String): String =
    s"(${sqlSpread16(xE)} | (${sqlSpread16(yE)} << 1))"

  /** Reference JVM implementation for property tests. */
  def interleaveLocal(x: Int, y: Int): Long = {
    def sp(v: Long): Long = {
      var r = v & 0xFFFFL
      r = (r | (r << 8)) & 0x00FF00FFL
      r = (r | (r << 4)) & 0x0F0F0F0FL
      r = (r | (r << 2)) & 0x33333333L
      (r | (r << 1)) & 0x55555555L
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
