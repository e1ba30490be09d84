package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Flesch readability per document — the classic text-difficulty feature
  * a quality-scoring pipeline ships next to length/stopword ratios
  * ([[TextAnalysis]]) and the published gates ([[Gopher]]/[[C4]]): both
  * Flesch Reading Ease and the Flesch–Kincaid grade level, from word,
  * sentence and syllable counts.
  *
  * Syllables use the standard vowel-group heuristic: per word,
  * `max(1, #maximal [aeiouy]+ runs)` — deterministic, language-blind, and
  * replayable in any engine with a regex (no dictionary). Sentences are
  * maximal terminal-punctuation runs `[.!?]+` over the normalized text,
  * clamped to ≥ 1.
  *
  * Exactness contract: the published constants are decimal (206.835,
  * 1.015, 84.6 / 0.39, 11.8, 15.59), so both scores are emitted in exact
  * integer MICRO-units with one integer `DIV` per ratio term —
  * per-doc truncation identical in both engines, never a float sum:
  *   fre_micro = 206835000 − (1015000·w) DIV s − (84600000·syl) DIV w
  *   fk_grade_micro = (390000·w) DIV s + (11800000·syl) DIV w − 15590000
  * Headroom: 8.46·10⁷·syl stays in BIGINT to ~10¹¹ syllables per doc.
  * Empty docs (w = 0) emit NULL scores in both engines.
  *
  * Scale shape: one explode + doc-keyed hash aggregate (map-side
  * combinable) + a map-only sentence count joined back on doc_id —
  * the text_stats posture, nothing corpus-global.
  */
object Readability {

  /** doc_id of the synthetic empty-doc probe row the oracle gate appends on
    * BOTH engines (fixture docs never normalize to empty — verified 0/5000
    * — so without the probe the oracle never exercises the w = 0 path the
    * round-10 ADVICE found divergent). Negative: disjoint from fixture ids.
    */
  val ProbeDocId: Long = -1L

  /** docs ∪ the empty-doc probe row — what the oracle-gated query runs on.
    * `docs` needs only (doc_id, text); extra columns are dropped.
    */
  def withEmptyDocProbe(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .unionByName(docs.sparkSession.range(1)
        .select(lit(ProbeDocId).as("doc_id"), lit("").as("text")))

  def fk(docs: DataFrame): DataFrame = {
    val sents = docs.select(col("doc_id"),
      greatest(lit(1L),
        regexp_count(TextAnalysis.normText(col("text")), lit("[.!?]+"))
          .cast("long")).as("n_sentences"))
    val words = docs
      .select(col("doc_id"),
        explode_outer(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(col("doc_id"),
        when(col("tok").isNull, lit(null))
          .otherwise(greatest(lit(1L),
            regexp_count(col("tok"), lit("[aeiouy]+")).cast("long"))).as("syl"))
      .groupBy("doc_id")
      .agg(count(col("syl")).as("n_words"),
        coalesce(sum("syl"), lit(0L)).as("n_syllables"))
    words.join(sents, Seq("doc_id"))
      .select(col("doc_id"), col("n_words"), col("n_sentences"), col("n_syllables"),
        when(col("n_words") === 0L, lit(null))
          .otherwise(lit(206835000L)
            - call_function("div", lit(1015000L) * col("n_words"), col("n_sentences"))
            - call_function("div", lit(84600000L) * col("n_syllables"), col("n_words")))
          .cast("long").as("fre_micro"),
        when(col("n_words") === 0L, lit(null))
          .otherwise(
            call_function("div", lit(390000L) * col("n_words"), col("n_sentences"))
            + call_function("div", lit(11800000L) * col("n_syllables"), col("n_words"))
            - lit(15590000L))
          .cast("long").as("fk_grade_micro"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[fk]], term-for-term.
    *
    * NULL-guard (round-10 ADVICE fix): the LEFT JOIN gives an empty doc one
    * row with `tk.tok = NULL`, and DuckDB 1.0.0 `greatest(1, NULL) = 1`
    * (NULL-skipping, pinned by the `greatest_ignores_null` canary probe) —
    * an unguarded `sum(greatest(1, ...))` would count 1 syllable where the
    * Spark side counts 0. The CASE keeps the NULL row NULL so the sum
    * coalesces to 0 in both engines.
    */
  def sqlFk: String = {
    val toks = TextAnalysis.sqlTokens("text")
    val norm = TextAnalysis.sqlNormText("text")
    s"""WITH docs AS (SELECT doc_id, text FROM documents
       |              UNION ALL SELECT ${ProbeDocId}, ''),
       |tk AS (SELECT doc_id, unnest($toks) AS tok FROM docs),
       |ws AS (SELECT d.doc_id, count(tk.tok)::BIGINT AS w,
       |         coalesce(sum(CASE WHEN tk.tok IS NULL THEN NULL
       |           ELSE greatest(1,
       |             len(regexp_extract_all(tk.tok, '[aeiouy]+'))) END),
       |           0)::BIGINT AS syl
       |       FROM docs d LEFT JOIN tk USING (doc_id) GROUP BY 1),
       |sn AS (SELECT doc_id,
       |         greatest(1, len(regexp_extract_all($norm, '[.!?]+')))::BIGINT AS s
       |       FROM docs)
       |SELECT ws.doc_id, w AS n_words, s AS n_sentences, syl AS n_syllables,
       |  CASE WHEN w = 0 THEN NULL
       |       ELSE 206835000 - (1015000 * w) // s - (84600000 * syl) // w
       |       END::BIGINT AS fre_micro,
       |  CASE WHEN w = 0 THEN NULL
       |       ELSE (390000 * w) // s + (11800000 * syl) // w - 15590000
       |       END::BIGINT AS fk_grade_micro
       |FROM ws JOIN sn USING (doc_id) ORDER BY doc_id""".stripMargin
  }
}
