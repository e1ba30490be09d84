package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the correctness baseline; the scale path is
  * IVF-style cell restriction (a coarse cluster assignment column — here the
  * fixture's `label` — bounds each query's candidate set, turning the
  * all-pairs product into a per-cell join). Both share the same `Column`
  * dot-product kernel (`zip_with` + left-fold `aggregate`, codegen'd).
  */
object Similarity {

  /** Exact left-fold dot product of two float vectors, in doubles (the fold
    * order matters for bit-stable results — DuckDB's mirror folds the same
    * way). Backed by the codegen'd [[graft.expr.FloatVectorDot]]; the
    * higher-order-function fold it replaces (kept as [[dotFold]] for the
    * equivalence spec) runs interpreted and dominated similarity queries.
    */
  def dot(a: Column, b: Column): Column = graft.expr.VecMath.floatDot(a, b)

  /** Reference implementation of [[dot]] as a Column fold (bit-identical). */
  def dotFold(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
  def sqlDot(aE: String, bE: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, " +
      s"[p[1]::DOUBLE * p[2]::DOUBLE for p in list_zip($aE, $bE)]), " +
      s"(acc, x) -> acc + x)"

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  def sqlCosine(aE: String, bE: String): String =
    s"(${sqlDot(aE, bE)} / (sqrt(${sqlDot(aE, aE)}) * sqrt(${sqlDot(bE, bE)})))"

  /** Vectors with their norm precomputed once (a narrow projection) — at
    * scale the join side then costs one dot product per pair instead of
    * three. Bit-identical to inline `cosine`: `sqrt(dot(v,v))` is the same
    * expression, evaluated once.
    */
  def withNorm(emb: DataFrame): DataFrame =
    emb.withColumn("nrm", sqrt(dot(col("embedding"), col("embedding"))))

  /** Brute-force cosine top-k: for each query vector (filtered by `isQuery`)
    * rank all other vectors by rounded cosine (desc, id tiebreak). Rounding
    * before ranking keeps the ranking oracle-stable.
    */
  def topK(emb: DataFrame, isQuery: Column, k: Int,
           sameCellOnly: Boolean = false): DataFrame = {
    val n = withNorm(emb)
    val q = n.filter(isQuery)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("label").as("q_label"), col("nrm").as("q_nrm"))
    val cond = if (sameCellOnly) col("q_label") === col("label") else lit(true)
    val pairs = q.join(n, cond && col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")), 6)
          .as("cos_r"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos_r").desc, col("n_id"))
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs within a cell (a < b). */
  def nearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val n = withNorm(emb)
    n.as("l").join(n.as("r"),
        col("l.label") === col("r.label") && col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"),
        round(dot(col("l.embedding"), col("r.embedding")) / (col("l.nrm") * col("r.nrm")), 6)
          .as("cos_r"))
      .filter(col("cos_r") >= threshold)
  }
}
