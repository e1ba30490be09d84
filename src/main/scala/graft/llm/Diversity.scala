package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lexical-diversity audit per source: Simpson concentration λ =
  * Σ_t (n_t / N)² — the probability two independently drawn tokens are
  * the same type. The repetitiveness/diversity number a corpus owner
  * reads next to [[graft.SparkEntry]]'s `vocab_coverage` head-mass rows:
  * high λ = a few types dominate (boilerplate-heavy source), low λ =
  * diverse vocabulary. Chosen over Shannon entropy deliberately: entropy
  * needs `ln` (not correctly rounded, banned from the determinism
  * contracts — BASELINE.md round-5), while Simpson is a RATIONAL
  * function of the counts, so
  *   simpson_ppm = (Σ n_t²) · 10⁶ DIV N²
  * is ONE exact integer division per source, replayed bit-for-bit by the
  * oracle. Sums ride DECIMAL(38,0): Σ n_t² ≤ N² holds to N ~ 10¹⁵
  * tokens per source against the 10³⁸ ceiling.
  *
  * Scale shape: one explode + (source, token) hash aggregate (map-side
  * combinable, the vocab_topk posture), then a source-count-bounded
  * re-aggregate. Nothing corpus-global, no window.
  */
object Diversity {

  def simpson(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("source", "tok")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"))
      .groupBy("source")
      .agg(sum(col("n")).as("nn"), count(lit(1)).as("n_types"),
        sum(col("n") * col("n")).as("s2"))
      .select(col("source"),
        col("nn").cast("long").as("n_tokens"),
        col("n_types").cast("long").as("n_types"),
        expr("CAST((s2 * 1000000) DIV (nn * nn) AS BIGINT)").as("simpson_ppm"))
      .orderBy("source")

  /** DuckDB mirror of [[simpson]]. */
  def sqlSimpson: String = {
    val toks = TextAnalysis.sqlTokens("text")
    s"""WITH tc AS (SELECT source, tok, count(*)::HUGEINT AS n
       |  FROM (SELECT source, unnest($toks) AS tok FROM documents)
       |  GROUP BY 1, 2)
       |SELECT source, sum(n)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types,
       |  ((sum(n * n) * 1000000) // (sum(n) * sum(n)))::BIGINT AS simpson_ppm
       |FROM tc GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
