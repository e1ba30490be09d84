package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.expr.PortableHash

/** Deterministic per-group sampling for training-data mixing.
  *
  * [[graft.llm.Scrub.stratifiedKeep]] samples by RATE (ppm per group);
  * this module samples by COUNT: exactly `k` rows per group, uniformly
  * without replacement — the distributed, replayable analog of reservoir
  * sampling. The sample is the k smallest portable-hash values per group
  * (hash order is a uniform random permutation, and seed + key make it
  * reproducible on any topology — same contract as `stratifiedKeep`).
  *
  * Scale shape (two passes, no global sort, no unbounded window):
  *   1. per-group counts — a map-side-partial hash aggregate producing
  *      |groups| rows (languages × sources: bounded, nowhere near data
  *      scale), broadcast back;
  *   2. hash-threshold prefilter: keep rows whose hash falls in the
  *      smallest `margin·k / n_g` fraction of the hash space — the window
  *      rank then runs over ~margin·k rows per group instead of n_g.
  *      The k sample members always survive the prefilter whenever the
  *      group's k-th smallest hash is under the threshold; with
  *      margin = 8 the survivor count is Binomial(n_g, 8k/n_g) and
  *      P[fewer than k survive] ≤ exp(−(49/16)k) (Chernoff) — ~10⁻¹³ at
  *      k = 10, and it SHRINKS as corpora grow. The DuckDB oracle applies
  *      the identical prefilter, so the engines agree bit-for-bit
  *      regardless.
  *
  * Threshold arithmetic is pure integer — `(margin·k·2³² + n_g − 1) div
  * n_g` — so both engines compute the exact same cut (no FP rounding at
  * the boundary). margin·k·2³² stays far under 2⁶³ for any sane k.
  */
object Sample {

  val Margin = 8L
  private val HashSpace = 1L << 32

  private def hashCol(seed: String, group: Column, id: Column): Column =
    PortableHash.phash(concat_ws(":", lit(seed), group, id.cast("string")))

  /** Exactly-k-per-group uniform sample: (group, id, rnk ≤ k), rnk in hash
    * order. Groups smaller than k keep every row.
    */
  def reservoirByGroup(df: DataFrame, groupCol: String, idCol: String,
                       k: Int, seed: String): DataFrame = {
    val withH = df.select(col(groupCol), col(idCol),
      hashCol(seed, col(groupCol), col(idCol)).as("hv"))
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("n_g"))
    // `div`, not `/`: Spark's `/` is double division, and an FP quotient
    // can round across the threshold boundary the oracle computes exactly
    val thr = least(lit(HashSpace),
      expr(s"(${Margin * k * HashSpace} + n_g - 1) div n_g"))
    val surv = withH.join(broadcast(counts), Seq(groupCol))
      .filter(col("hv") < thr)
    surv
      .withColumn("rnk", row_number().over(
        Window.partitionBy(groupCol).orderBy(col("hv"), col(idCol))))
      .filter(col("rnk") <= k)
      .select(col(groupCol), col(idCol), col("rnk"))
  }

  /** DuckDB mirror of [[reservoirByGroup]] over a table: same hash, same
    * integer threshold, same rank order.
    */
  def sqlReservoirByGroup(table: String, groupCol: String, idCol: String,
                          k: Int, seed: String): String = {
    val h = PortableHash.sqlPhash(s"('$seed' || ':' || $groupCol || ':' || $idCol::VARCHAR)")
    s"""WITH h AS (SELECT $groupCol, $idCol, $h AS hv FROM $table),
       |c AS (SELECT $groupCol, count(*) AS n_g FROM h GROUP BY 1),
       |s AS (SELECT h.* FROM h JOIN c USING ($groupCol)
       |  WHERE hv < least($HashSpace, (${Margin * k * HashSpace} + n_g - 1) // n_g)),
       |r AS (SELECT $groupCol, $idCol, row_number() OVER (
       |    PARTITION BY $groupCol ORDER BY hv, $idCol) AS rnk FROM s)
       |SELECT $groupCol, $idCol, rnk FROM r WHERE rnk <= $k
       |ORDER BY $groupCol, rnk""".stripMargin
  }
}
