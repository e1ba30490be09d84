package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-slice distribution diagnostics: how far apart are the token
  * distributions of two corpus slices (sources), and which slice does a
  * document's token mix most resemble? Both are the groupBy/join algebra
  * of a mixing pipeline — the numbers a data-mixing run reads before
  * choosing rates ([[graft.SparkEntry]] `mix_rates`) and the cheap
  * source-attribution model a contamination audit runs after scraping.
  *
  * All arithmetic is exact integer/decimal (the repo-wide ppm contract):
  * total-variation distance instead of KL/JS because TV is RATIONAL in
  * the empirical probabilities — TV(P,Q) = ½·Σ|pᵢ−qᵢ| =
  * Σ|c1ᵢ·n2 − c2ᵢ·n1| / (2·n1·n2) — so both engines reproduce it
  * bit-for-bit with decimal arithmetic, where a float-log divergence
  * would hash-diverge in the last ulp across libm implementations. TV is
  * also the bound that matters operationally: it is exactly the maximal
  * difference in probability either slice assigns to any token event.
  *
  * Reference scope: the reference has no text operators (occurrence
  * records are its corpus analog, `MapBuilder.java:134-174`); these extend
  * the engine for the LLM-pipeline north star.
  */
object Divergence {

  private val Ppm = 1000000L

  /** Pairwise total-variation distance (ppm) between per-source token
    * distributions, with per-source token totals and the shared-vocabulary
    * size. One tokenize+explode pass builds the (source, tok, c) model
    * table (Zipf-bounded, checkpointed — it feeds both pair sides); pairs
    * enumerate by joining against the broadcast source-totals list (S
    * sources → S·(S−1)/2 pairs, each row expanded at most S−1 times), and
    * the union-of-vocabularies semantics of Σ|p−q| comes from a full outer
    * join on (s1, s2, tok) — missing-in-one tokens contribute their full
    * mass, exactly as the formula requires. Products run in DECIMAL(38,0):
    * c·n overflows BIGINT once c ~ 1e12 tokens meets n ~ 1e13 — real at
    * 100 TB.
    */
  def pairwiseTV(docs: DataFrame): DataFrame = {
    val cnt = docs
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      .localCheckpoint() // feeds totals + both pair sides
    val tot = cnt.groupBy("source").agg(sum(col("c")).as("n"))
    val e1 = cnt
      .join(broadcast(tot.select(col("source").as("s2"))), col("source") < col("s2"))
      .select(col("source").as("s1"), col("s2"), col("tok"), col("c").as("c1"))
    val e2 = cnt
      .join(broadcast(tot.select(col("source").as("s1"))), col("s1") < col("source"))
      .select(col("s1"), col("source").as("s2"), col("tok"), col("c").as("c2"))
    val j = e1.join(e2, Seq("s1", "s2", "tok"), "full_outer")
      .select(col("s1"), col("s2"), col("tok"),
        coalesce(col("c1"), lit(0L)).as("c1"),
        coalesce(col("c2"), lit(0L)).as("c2"))
      .join(broadcast(tot.select(col("source").as("s1"), col("n").as("n1"))), Seq("s1"))
      .join(broadcast(tot.select(col("source").as("s2"), col("n").as("n2"))), Seq("s2"))
    j.groupBy("s1", "s2", "n1", "n2")
      .agg(
        sum(expr("abs(CAST(c1 AS DECIMAL(38,0)) * n2 - CAST(c2 AS DECIMAL(38,0)) * n1)"))
          .as("sum_t"),
        sum(when(col("c1") > 0 && col("c2") > 0, 1L).otherwise(0L)).as("shared_vocab"))
      .select(col("s1"), col("s2"), col("n1"), col("n2"), col("shared_vocab"),
        expr(s"CAST((sum_t * $Ppm) div (CAST(2 AS DECIMAL(38,0)) * n1 * n2) AS BIGINT)")
          .as("tv_ppm"))
  }

  /** DuckDB mirror of [[pairwiseTV]] over a `documents` table. */
  def sqlPairwiseTV: String = {
    val toks = TextAnalysis.sqlTokens("text")
    s"""WITH t AS (SELECT source, unnest($toks) AS tok FROM documents),
       |c AS (SELECT source, tok, count(*)::BIGINT AS c FROM t GROUP BY 1, 2),
       |tot AS (SELECT source, sum(c)::BIGINT AS n FROM c GROUP BY 1),
       |e1 AS (SELECT c.source AS s1, t2.source AS s2, c.tok, c.c AS c1
       |       FROM c JOIN tot t2 ON c.source < t2.source),
       |e2 AS (SELECT t1.source AS s1, c.source AS s2, c.tok, c.c AS c2
       |       FROM c JOIN tot t1 ON t1.source < c.source),
       |j AS (SELECT coalesce(e1.s1, e2.s1) AS s1, coalesce(e1.s2, e2.s2) AS s2,
       |        coalesce(e1.tok, e2.tok) AS tok,
       |        coalesce(e1.c1, 0) AS c1, coalesce(e2.c2, 0) AS c2
       |      FROM e1 FULL OUTER JOIN e2
       |        ON e1.s1 = e2.s1 AND e1.s2 = e2.s2 AND e1.tok = e2.tok),
       |g AS (SELECT j.s1, j.s2, n1.n AS n1, n2.n AS n2,
       |        sum(abs(j.c1::DECIMAL(38,0) * n2.n - j.c2::DECIMAL(38,0) * n1.n)) AS sum_t,
       |        sum(CASE WHEN j.c1 > 0 AND j.c2 > 0 THEN 1 ELSE 0 END)::BIGINT AS shared_vocab
       |      FROM j JOIN tot n1 ON j.s1 = n1.source JOIN tot n2 ON j.s2 = n2.source
       |      GROUP BY 1, 2, 3, 4)
       |SELECT s1, s2, n1, n2, shared_vocab,
       |  ((sum_t * $Ppm)::HUGEINT // (2::HUGEINT * n1 * n2))::BIGINT AS tv_ppm
       |FROM g ORDER BY 1, 2""".stripMargin
  }

  /** Add-one-smoothed multinomial source attribution: score(doc, s) =
    * Σ_tokens ppm(tok | s) with ppm(tok|s) = ((c(s,tok)+1)·1e6) div
    * (n_s + V) — the linear-likelihood prototype classifier (the exact
    * integer stand-in for naive Bayes, whose log-probabilities are
    * float-log and therefore off the oracle contract; same ranking signal
    * on token-typicality). Predicted source = argmax score, ties broken by
    * source name ascending. Trained on the full corpus and applied to
    * itself (the self-attribution audit — off-diagonal rows ARE the
    * interesting output: documents whose token mix belongs to another
    * slice).
    *
    * Shape: one tokenize+explode instance stream (checkpointed: it trains
    * the count model AND carries the scoring join); the dense (tok ×
    * source) model comes from a broadcast cross with the S-row source
    * list, so unseen (tok, source) cells get their smoothed floor without
    * special-casing the scoring join; scores aggregate per (doc, source)
    * with map-side partials, and the argmax is a per-doc window over
    * exactly S rows — never a data-sized partition.
    */
  def sourceClassifier(docs: DataFrame): DataFrame = {
    val inst = docs
      .select(col("doc_id"), col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .localCheckpoint() // feeds model counts, vocab total, scoring join
    val cnt = inst.groupBy(col("source").as("src"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("src").agg(sum(col("c")).as("n"))
    val vocab = inst.agg(count_distinct(col("tok")).as("v"))
    val dense = inst.select("tok").distinct()
      .crossJoin(broadcast(tot))
      .join(cnt, Seq("src", "tok"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("tok"), col("src"),
        expr(s"((coalesce(c, 0) + 1) * $Ppm) div (n + v)").as("ppm"))
    val scores = inst.join(dense, Seq("tok"))
      .groupBy(col("doc_id"), col("src"))
      .agg(sum(col("ppm")).as("score"))
    val ranked = scores.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id")
        .orderBy(col("score").desc, col("src").asc)))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("src").as("pred"), col("score").as("score_ppm"))
    docs.select(col("doc_id"), col("source")).join(ranked, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("pred"), lit("")).as("pred"),
        coalesce(col("score_ppm"), lit(0L)).as("score_ppm"))
  }

  /** DuckDB mirror of [[sourceClassifier]] over a `documents` table. */
  def sqlSourceClassifier: String = {
    val toks = TextAnalysis.sqlTokens("text")
    s"""WITH i AS (SELECT doc_id, source, unnest($toks) AS tok FROM documents),
       |c AS (SELECT source AS src, tok, count(*)::BIGINT AS c FROM i GROUP BY 1, 2),
       |tot AS (SELECT src, sum(c)::BIGINT AS n FROM c GROUP BY 1),
       |vv AS (SELECT count(DISTINCT tok)::BIGINT AS v FROM i),
       |dense AS (SELECT tk.tok, tot.src,
       |    ((coalesce(c.c, 0) + 1) * $Ppm) // (tot.n + vv.v) AS ppm
       |  FROM (SELECT DISTINCT tok FROM i) tk
       |  CROSS JOIN tot
       |  LEFT JOIN c ON c.src = tot.src AND c.tok = tk.tok
       |  CROSS JOIN vv),
       |sc AS (SELECT i.doc_id, dense.src, sum(dense.ppm)::BIGINT AS score
       |       FROM i JOIN dense ON i.tok = dense.tok GROUP BY 1, 2),
       |rk AS (SELECT doc_id, src, score,
       |         row_number() OVER (PARTITION BY doc_id
       |           ORDER BY score DESC, src ASC) AS rn FROM sc)
       |SELECT d.doc_id, d.source,
       |  coalesce(rk.src, '') AS pred,
       |  coalesce(rk.score, 0)::BIGINT AS score_ppm
       |FROM documents d LEFT JOIN rk ON d.doc_id = rk.doc_id AND rk.rn = 1
       |ORDER BY d.doc_id""".stripMargin
  }
}
