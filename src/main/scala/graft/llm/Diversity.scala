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

  /** Hapax spectrum — the frequency-of-frequencies head every corpus
    * linguist reads first: type/token totals, hapax (f = 1) and dis
    * (f = 2) legomena counts, the hapax share of the vocabulary, and the
    * Good–Turing unseen-mass estimate n₁/N — the probability the NEXT
    * token drawn is a type the corpus has never seen, i.e. how far from
    * vocabulary saturation a crawl still is (the "keep crawling?" number
    * next to `vocab_growth`'s curve). All exact integer ppm via one DIV
    * per ratio; one vocab hash aggregate + a 1-row re-aggregate — the
    * [[simpson]] posture without even the per-source split.
    */
  def hapax(docs: DataFrame): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("f"))
      .agg(count(lit(1)).as("n_types"), coalesce(sum(col("f")), lit(0L)).as("nn"),
        count(when(col("f") === 1, 1)).as("n_hapax"),
        count(when(col("f") === 2, 1)).as("n_dis"))
      .select(col("n_types"), col("nn").as("n_tokens"),
        col("n_hapax"), col("n_dis"),
        when(col("n_types") === 0, 0L)
          .otherwise(call_function("div", col("n_hapax") * 1000000L, col("n_types")))
          .cast("long").as("hapax_type_ppm"),
        when(col("nn") === 0, 0L)
          .otherwise(call_function("div", col("n_hapax") * 1000000L, col("nn")))
          .cast("long").as("gt_unseen_ppm"))

  /** DuckDB mirror of [[hapax]]. */
  def sqlHapax: String = {
    val toks = TextAnalysis.sqlTokens("text")
    s"""WITH vc AS (SELECT tok, count(*)::BIGINT AS f
       |  FROM (SELECT unnest($toks) AS tok FROM documents) GROUP BY 1),
       |a AS (SELECT count(*)::BIGINT AS n_types,
       |        coalesce(sum(f), 0)::BIGINT AS nn,
       |        count(*) FILTER (WHERE f = 1)::BIGINT AS n_hapax,
       |        count(*) FILTER (WHERE f = 2)::BIGINT AS n_dis FROM vc)
       |SELECT n_types, nn AS n_tokens, n_hapax, n_dis,
       |  (CASE WHEN n_types = 0 THEN 0
       |        ELSE (n_hapax * 1000000) // n_types END)::BIGINT AS hapax_type_ppm,
       |  (CASE WHEN nn = 0 THEN 0
       |        ELSE (n_hapax * 1000000) // nn END)::BIGINT AS gt_unseen_ppm
       |FROM a""".stripMargin
  }

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
