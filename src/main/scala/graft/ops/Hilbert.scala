package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hilbert-curve data layout — the locality-superior sibling of
  * [[ZOrder]]: the Hilbert curve visits every cell of the 2^order grid
  * with NO diagonal jumps (consecutive indices are always 4-neighbors),
  * so contiguous key ranges make tighter bounding boxes than Morton
  * order's corner-to-corner leaps — fewer false-positive files for a
  * min/max data-skipping reader at the same file count. This is the
  * curve behind Delta/Iceberg's `OPTIMIZE ... HILBERT` variants.
  *
  * The index is the classic xy2d bit descent (the public-domain
  * quadrant-rotation loop): per bit level s = 2^(order-1) … 1, take the
  * quadrant bits (rx, ry), add `s²·((3·rx) ⊕ ry)` to the index, and
  * rotate/reflect the coordinates into the child frame.
  *
  * SHAPE MATTERS here (the repo's staging discipline): each level's
  * (x, y, d) state lands in its OWN projection. Every level references
  * the previous x and y about three times, so inlining the recursion
  * into one expression grows the tree ~6× per level — 6^16 nodes at
  * order 16. As multi-use aliases the levels stay linear
  * (CollapseProject only inlines single-use aliases) and whole-stage
  * codegen fuses the 16 projections into one straight-line pass. The
  * DuckDB mirror stages identically through 16 chained CTEs.
  */
object Hilbert {

  /** df + Hilbert index of the `order`-bit grid coords in `xCol`/`yCol`
    * (longs in [0, 2^order)) as column `out`. Narrow per-row projection —
    * no shuffle; layout itself is [[ZOrder.layout]] on the output key.
    */
  def withIndex(df: DataFrame, xCol: String, yCol: String, order: Int,
                out: String): DataFrame = {
    require(order >= 1 && order <= 31, s"order must be in [1, 31], got $order")
    var cur = df
      .withColumn("__hx", col(xCol).cast("long"))
      .withColumn("__hy", col(yCol).cast("long"))
      .withColumn("__hd", lit(0L))
    var s = 1L << (order - 1)
    while (s > 0) {
      cur = cur
        .withColumn("__rx",
          when(col("__hx").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L)))
        .withColumn("__ry",
          when(col("__hy").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L)))
        .withColumn("__hd", col("__hd") +
          lit(s * s) * (lit(3L) * col("__rx")).bitwiseXOR(col("__ry")))
        // rotation: only the ry == 0 branch transforms (swap, with a
        // reflection when rx == 1); the else branch passes through
        .withColumn("__nx",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit(s - 1) - col("__hy")).otherwise(col("__hy")))
            .otherwise(col("__hx")))
        .withColumn("__ny",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit(s - 1) - col("__hx")).otherwise(col("__hx")))
            .otherwise(col("__hy")))
        .withColumn("__hx", col("__nx"))
        .withColumn("__hy", col("__ny"))
        .drop("__rx", "__ry", "__nx", "__ny")
      s >>= 1
    }
    cur.withColumn(out, col("__hd")).drop("__hx", "__hy", "__hd")
  }

  /** DuckDB mirror: CTE fragment `, <p>0 AS (...), …, <p>N AS (...)`
    * continuing an open WITH clause. `<p>0` selects `carry` columns plus
    * the initial state from `baseRel`; each level CTE advances the state;
    * the final CTE `<p>${order}` exposes `carry` + `hd` (the index).
    */
  def sqlIndexCtes(baseRel: String, carry: Seq[String], xE: String, yE: String,
                   order: Int, p: String = "h"): String = {
    val carryList = if (carry.isEmpty) "" else carry.mkString("", ", ", ", ")
    val b = new StringBuilder
    b ++= s", ${p}0 AS (SELECT $carryList($xE)::BIGINT AS hx, ($yE)::BIGINT AS hy, 0::BIGINT AS hd FROM $baseRel)"
    var s = 1L << (order - 1)
    var lvl = 0
    while (s > 0) {
      lvl += 1
      val rx = s"(CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END)"
      val ry = s"(CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)"
      b ++= s""",
               |${p}$lvl AS (SELECT $carryList
               |  hd + ${s * s}::BIGINT * xor(3 * $rx, $ry)::BIGINT AS hd,
               |  CASE WHEN $ry = 0
               |       THEN (CASE WHEN $rx = 1 THEN ${s - 1} - hy ELSE hy END)
               |       ELSE hx END AS hx,
               |  CASE WHEN $ry = 0
               |       THEN (CASE WHEN $rx = 1 THEN ${s - 1} - hx ELSE hx END)
               |       ELSE hy END AS hy
               |  FROM ${p}${lvl - 1})""".stripMargin
      s >>= 1
    }
    b.toString
  }

  /** Reference JVM implementation for property tests. */
  def indexLocal(x0: Long, y0: Long, order: Int): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
