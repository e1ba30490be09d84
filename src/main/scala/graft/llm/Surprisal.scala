package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-document unigram surprisal — the deterministic cousin of the
  * perplexity-bucket filter every published data-curation recipe runs
  * (C4/Gopher filter on LM perplexity; CCNet buckets the corpus by it):
  * docs whose tokens are globally RARE carry high surprisal (noise,
  * boilerplate-free rarities, other-language leakage), docs of only
  * stop-words carry almost none. Selecting/bucketing on this column is
  * the pipeline use; the score itself needs no trained LM.
  *
  * Exactness contract: true surprisal is Σ log2(N/f) — but `log`/`pow`
  * are banned from oracle contracts (not correctly rounded across
  * engines). The whole-BIT surprisal replaces the log with the integer
  * bit width both engines compute identically on integers:
  *   bits(tok) = length(bin(N DIV f)) − 1   ( = floor(log2(N DIV f)) )
  * pinned by the `bin_width` canary probe, and the per-doc mean ships in
  * exact integer micro-bits with one integer DIV:
  *   mean_bits_micro = (Σ bits · 10⁶) DIV n_tok.
  * Truncation error ≤ 1 bit per token, identical in both engines — a
  * BUCKETING feature, not a likelihood.
  *
  * Scale shape: one token explode (corpus-linear), one vocab hash
  * aggregate, the 1-row total broadcast onto the Zipf-small vocab frame,
  * one tokens→vocab equi-join shuffled on `tok`, one doc-keyed hash
  * aggregate. Nothing quadratic, no window, no driver crossing beyond
  * the 1-row total.
  */
object Surprisal {

  /** (doc_id, n_tok, mean_bits_micro) for every document; docs with no
    * tokens emit n_tok = 0 and a NULL score (nothing to average).
    */
  def perDoc(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val vc = toks.groupBy("tok").agg(count(lit(1)).as("f"))
    val n1 = vc.agg(sum(col("f")).as("nn")) // 1-row corpus total
    val w = vc.crossJoin(broadcast(n1))
      .select(col("tok"),
        (length(bin(call_function("div", col("nn"), col("f")))) - 1)
          .cast("long").as("wbits"))
    val pd = toks.join(w, Seq("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum(col("wbits")).as("bits"))
    docs.select(col("doc_id")).join(pd, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        when(col("n_tok").isNull, lit(null).cast("long"))
          .otherwise(call_function("div", col("bits") * 1000000L, col("n_tok")))
          .as("mean_bits_micro"))
      .orderBy("doc_id")
  }

  /** Conditional BIGRAM surprisal — the fluency proxy [[perDoc]] cannot
    * see: scrambled or template-stitched text keeps a normal unigram
    * profile but its word PAIRS are globally rare, so
    *   bits(w₁w₂) = width(f(w₁) DIV f(w₁w₂)) − 1  ( ≈ −log2 P(w₂|w₁) )
    * spikes. Same whole-bit / micro-mean exactness contract as [[perDoc]]
    * (`bin_width` canary). Docs with < 2 tokens emit n_bigrams = 0 and a
    * NULL score.
    *
    * Scale shape: adds one bigram explode (corpus-linear) and one
    * bigram-keyed hash aggregate to the unigram plan; the bigram→unigram
    * prefix join ships 64-bit-ish short strings shuffled on the bigram /
    * prefix keys. Nothing quadratic, no window.
    */
  def perDocBigram(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tk"))
    val bgs = toks.select(col("doc_id"),
      explode(TextAnalysis.shingles(col("tk"), 2)).as("bg"))
    val c2 = bgs.groupBy("bg").agg(count(lit(1)).as("f2"))
    val c1 = docs.select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("f1"))
    val w = c2
      .join(c1, split(col("bg"), " ").getItem(0) === col("tok"))
      .select(col("bg"),
        (length(bin(call_function("div", col("f1"), col("f2")))) - 1)
          .cast("long").as("wbits"))
    val pd = bgs.join(w, Seq("bg"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("wbits")).as("bits"))
    docs.select(col("doc_id")).join(pd, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(col("n_bigrams").isNull, lit(null).cast("long"))
          .otherwise(call_function("div", col("bits") * 1000000L, col("n_bigrams")))
          .as("mean_bits_micro"))
      .orderBy("doc_id")
  }

  /** Per-document character entropy in whole bits — the
    * encoding-noise / gibberish screen the token-level scores miss
    * (mojibake, base64 blobs, and key-mash have near-uniform char
    * distributions → high entropy; single-char runs → near zero). True
    * H = Σ (c/n)·log2(n/c); the whole-bit form replaces the log with the
    * integer bit width (the [[perDoc]] / `bin_width`-canary contract):
    *   sum_bits = Σ_ch c_ch · (length(bin(n DIV c_ch)) − 1),
    *   mean_bits_micro = (sum_bits · 10⁶) DIV n
    * — exact integers end-to-end, identical truncation both engines.
    * Scale shape: one char explode (O(total chars), corpus-linear), one
    * (doc, char) hash aggregate, one doc-keyed re-aggregate with the
    * per-doc total riding a window-free second aggregation; nothing
    * corpus-global, no driver crossing.
    */
  def perDocChars(docs: DataFrame): DataFrame = {
    val ch = docs.select(col("doc_id"),
      explode(regexp_extract_all(col("text"), lit("[\\s\\S]"), lit(0))).as("ch"))
    val cc = ch.groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
    val tot = cc.groupBy("doc_id").agg(sum(col("c")).as("n"))
    val pd = cc.join(tot, Seq("doc_id"))
      .select(col("doc_id"),
        (col("c") *
          (length(bin(call_function("div", col("n"), col("c")))) - 1).cast("long"))
          .as("bits"), col("n"))
      .groupBy("doc_id")
      .agg(max(col("n")).as("n_chars"), sum(col("bits")).as("bits"))
    docs.select(col("doc_id")).join(pd, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        when(col("n_chars").isNull, lit(null).cast("long"))
          .otherwise(call_function("div", col("bits") * 1000000L, col("n_chars")))
          .as("mean_bits_micro"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[perDocChars]], term-for-term. */
  def sqlPerDocChars: String =
    """WITH ch AS (SELECT doc_id,
      |    unnest(regexp_extract_all(text, '[\s\S]')) AS ch FROM documents),
      |cc AS (SELECT doc_id, ch, count(*)::BIGINT AS c FROM ch GROUP BY 1, 2),
      |tot AS (SELECT doc_id, sum(c)::BIGINT AS n FROM cc GROUP BY 1),
      |pd AS (SELECT cc.doc_id, max(tot.n)::BIGINT AS n_chars,
      |         sum(cc.c * (length(bin(tot.n // cc.c)) - 1))::BIGINT AS bits
      |       FROM cc JOIN tot USING (doc_id) GROUP BY 1)
      |SELECT d.doc_id, coalesce(pd.n_chars, 0)::BIGINT AS n_chars,
      |  CASE WHEN pd.n_chars IS NULL THEN NULL
      |       ELSE (pd.bits * 1000000) // pd.n_chars END::BIGINT
      |    AS mean_bits_micro
      |FROM documents d LEFT JOIN pd USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** DuckDB mirror of [[perDocBigram]], term-for-term. */
  def sqlPerDocBigram: String = {
    val toks = TextAnalysis.sqlTokens("text")
    val shingles = TextAnalysis.sqlShingles("tk", 2)
    s"""WITH tks AS (SELECT doc_id, $toks AS tk FROM documents),
       |bg AS (SELECT doc_id, unnest($shingles) AS bg FROM tks),
       |c2 AS (SELECT bg, count(*)::BIGINT AS f2 FROM bg GROUP BY 1),
       |c1 AS (SELECT tok, count(*)::BIGINT AS f1
       |       FROM (SELECT unnest($toks) AS tok FROM documents) GROUP BY 1),
       |w AS (SELECT c2.bg, (length(bin(c1.f1 // c2.f2)) - 1)::BIGINT AS wbits
       |      FROM c2 JOIN c1 ON string_split(c2.bg, ' ')[1] = c1.tok),
       |pd AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams,
       |         sum(wbits)::BIGINT AS bits
       |       FROM bg JOIN w USING (bg) GROUP BY 1)
       |SELECT d.doc_id, coalesce(pd.n_bigrams, 0)::BIGINT AS n_bigrams,
       |  CASE WHEN pd.n_bigrams IS NULL THEN NULL
       |       ELSE (pd.bits * 1000000) // pd.n_bigrams END::BIGINT
       |    AS mean_bits_micro
       |FROM documents d LEFT JOIN pd USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** DuckDB mirror of [[perDoc]], term-for-term. */
  def sqlPerDoc: String = {
    val toks = TextAnalysis.sqlTokens("text")
    s"""WITH tk AS (SELECT doc_id, unnest($toks) AS tok FROM documents),
       |vc AS (SELECT tok, count(*)::BIGINT AS f FROM tk GROUP BY 1),
       |n1 AS (SELECT sum(f)::BIGINT AS nn FROM vc),
       |w AS (SELECT tok, (length(bin(nn // f)) - 1)::BIGINT AS wbits
       |      FROM vc, n1),
       |pd AS (SELECT doc_id, count(*)::BIGINT AS n_tok,
       |         sum(wbits)::BIGINT AS bits
       |       FROM tk JOIN w USING (tok) GROUP BY 1)
       |SELECT d.doc_id, coalesce(pd.n_tok, 0)::BIGINT AS n_tok,
       |  CASE WHEN pd.n_tok IS NULL THEN NULL
       |       ELSE (pd.bits * 1000000) // pd.n_tok END::BIGINT AS mean_bits_micro
       |FROM documents d LEFT JOIN pd USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }
}
