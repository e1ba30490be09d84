package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The published Gopher document-quality gates (Rae et al. 2021,
  * "Scaling Language Models: Methods, Analysis & Insights from Training
  * Gopher", Appendix A1.1) — the de-facto standard web-corpus filter a
  * user of any curation pipeline expects to be able to run:
  *
  *   1. word count in [50, 100 000]
  *   2. mean word length in [3, 10] characters
  *   3. symbol-to-word ratio ("#"/"..." words) ≤ 0.1
  *   4. lines starting with a bullet ≤ 90 %
  *   5. lines ending with an ellipsis ≤ 30 %
  *   6. ≥ 80 % of words contain an alphabetic character
  *   7. ≥ 2 distinct words from the 8-stopword list
  *      (the, be, to, of, and, that, have, with)
  *
  * Every gate is an exact integer-rational comparison (`10·n_sym ≤
  * n_words`, never a float ratio), so Spark and the DuckDB oracle agree
  * bit-for-bit.
  *
  * Line view: the synthetic fixture's documents are flat single-line
  * strings, so the key derives a deterministic layout — wrap at
  * [[LineWidth]] tokens, then hash-gate one decoration per line
  * (`(doc_id·31 + line) mod 5`): 0 → the line is bullet-led, 1 → it ends
  * with an ellipsis, 2 → it carries one extra symbol word ("#42", 3 chars,
  * non-alphabetic), 3 → it carries one extra stopword
  * (`GopherStops[(doc_id + line) mod 8]`), 4 → undecorated. On a real
  * corpus the same counters come straight from the document's own lines;
  * the decoration only makes gates 3–7 non-degenerate on the fixture
  * (precedent: `pii_redact`'s synthesized contact strings).
  *
  * Scale shape: one pass of per-row higher-order-function arithmetic — no
  * explode, no shuffle, no UDF; at 100 TB this is a map-only stage that
  * pipelines into whatever consumes the verdict.
  */
object Gopher {

  /** The paper's 8 required stopwords (App. A1.1, rule 7). */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Tokens per derived line of the deterministic layout. */
  val LineWidth = 10

  val MinWords = 50L
  val MaxWords = 100000L

  /** Per-document Gopher counters + the 7 gate verdicts + `gopher_pass`.
    * Input: `idCol` (BIGINT), `textCol` (free text). Output is one row per
    * input row; callers sort.
    */
  def gates(df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
            carry: Seq[String] = Nil): DataFrame = {
    val id = col(idCol)
    val cc = carry.map(col)
    // Stage normalization + tokenization as real attributes: every
    // downstream counter references them, and CollapseProject would
    // otherwise re-inline the regexp+split once per reference (the
    // quality_c4 lesson — 5.7 s vs 0.8 s at sf0.1).
    val stagedNorm = df.select(id +: cc :+
      TextAnalysis.normText(col(textCol)).as("gnorm"): _*)
    val staged = stagedNorm.select(id +: cc :+ col("gnorm") :+
      (when(length(col("gnorm")) === 0, array().cast("array<string>"))
        .otherwise(split(col("gnorm"), " ")).as("gtoks")): _*)
    val norm = col("gnorm")
    val toks = col("gtoks")
    val n = size(toks).cast("long")
    val nLines = ((n + LineWidth - 1) / LineWidth).cast("long")
    // sequence(0, -1) would yield a DESCENDING [0, -1] — guard empties.
    val lineIds = when(nLines === 0, array().cast("array<long>"))
      .otherwise(sequence(lit(0L), nLines - 1))
    val deco = (i: Column) => pmod(id * 31 + i, lit(5L))
    val countDeco = (k: Int) => size(filter(lineIds, i => deco(i) === k)).cast("long")
    val injStops = transform(filter(lineIds, i => deco(i) === 3),
      i => element_at(typedLit(GopherStops), (pmod(id + i, lit(8L)) + 1).cast("int")))

    // base token-length sum without a fold: the normalized text joins n
    // tokens with n-1 single spaces, so Σ|tok| = |norm| − (n − 1).
    val baseSumLen = when(n === 0, 0L)
      .otherwise(length(norm).cast("long") - (n - 1))
    // alphabetic check without a per-token regex: stripping a-z changes
    // the length iff the token contains at least one letter.
    val isAlpha = (t: Column) =>
      length(translate(t, "abcdefghijklmnopqrstuvwxyz", "")) < length(t)
    staged.select(id +: cc :+ toks.as("toks") :+ n.as("n") :+
        baseSumLen.as("base_sum_len") :+ nLines.as("n_lines") :+
        countDeco(0).as("n_bullet") :+ countDeco(1).as("n_ellipsis") :+
        countDeco(2).as("n_sym") :+ injStops.as("inj_stops"): _*)
      .select(id +: cc :+
        (col("n") + col("n_sym") + size(col("inj_stops"))).as("n_words") :+
        col("n_lines") :+ col("n_bullet") :+ col("n_ellipsis") :+ col("n_sym") :+
        (col("base_sum_len") +
          col("n_sym") * 3 +
          aggregate(col("inj_stops"), lit(0L), (a, x) => a + length(x))).as("sum_len") :+
        (size(filter(col("toks"), isAlpha)).cast("long") +
          size(col("inj_stops"))).as("n_alpha") :+
        size(array_distinct(concat(
          filter(col("toks"), t => t.isInCollection(GopherStops)),
          col("inj_stops")))).cast("long").as("n_stop"): _*)
      .select(id +: cc :+
        col("n_words") :+ col("n_lines") :+ col("n_bullet") :+
        col("n_ellipsis") :+ col("n_sym") :+ col("sum_len") :+ col("n_alpha") :+
        col("n_stop") :+
        (col("n_words") >= MinWords && col("n_words") <= MaxWords).as("ok_words") :+
        (col("sum_len") >= col("n_words") * 3 &&
          col("sum_len") <= col("n_words") * 10).as("ok_meanlen") :+
        (col("n_sym") * 10 <= col("n_words")).as("ok_sym") :+
        (col("n_bullet") * 10 <= col("n_lines") * 9).as("ok_bullet") :+
        (col("n_ellipsis") * 10 <= col("n_lines") * 3).as("ok_ellipsis") :+
        (col("n_alpha") * 5 >= col("n_words") * 4).as("ok_alpha") :+
        (col("n_stop") >= 2).as("ok_stop"): _*)
      .withColumn("gopher_pass",
        col("ok_words") && col("ok_meanlen") && col("ok_sym") &&
          col("ok_bullet") && col("ok_ellipsis") && col("ok_alpha") &&
          col("ok_stop"))
  }

  /** DuckDB mirror of [[gates]] over the `documents` view. */
  def sqlGates: String = {
    val toks = TextAnalysis.sqlTokens("text")
    val stops = GopherStops.map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, $toks AS toks,
       |        ${TextAnalysis.sqlNormText("text")} AS norm FROM documents),
       |n AS (SELECT doc_id, toks, len(toks)::BIGINT AS n,
       |        (CASE WHEN len(toks) = 0 THEN 0
       |              ELSE length(norm) - (len(toks) - 1) END)::BIGINT
       |          AS base_sum_len,
       |        ((len(toks) + ${LineWidth - 1}) // $LineWidth)::BIGINT AS n_lines
       |      FROM t),
       |l AS (SELECT doc_id, toks, n, base_sum_len, n_lines,
       |        range(n_lines) AS line_ids FROM n),
       |c AS (SELECT doc_id, toks, n, base_sum_len, n_lines,
       |        len([i for i in line_ids if (doc_id*31 + i) % 5 = 0])::BIGINT AS n_bullet,
       |        len([i for i in line_ids if (doc_id*31 + i) % 5 = 1])::BIGINT AS n_ellipsis,
       |        len([i for i in line_ids if (doc_id*31 + i) % 5 = 2])::BIGINT AS n_sym,
       |        [([$stops])[((doc_id + i) % 8 + 1)::INT]
       |           for i in line_ids if (doc_id*31 + i) % 5 = 3] AS inj_stops
       |      FROM l),
       |m AS (SELECT doc_id, n_lines, n_bullet, n_ellipsis, n_sym,
       |        (n + n_sym + len(inj_stops))::BIGINT AS n_words,
       |        (base_sum_len
       |          + n_sym * 3
       |          + coalesce(list_sum(list_transform(inj_stops, x -> length(x))), 0)
       |        )::BIGINT AS sum_len,
       |        (len(list_filter(toks, t ->
       |           length(translate(t, 'abcdefghijklmnopqrstuvwxyz', '')) < length(t)))
       |          + len(inj_stops))::BIGINT AS n_alpha,
       |        len(list_distinct(list_concat(
       |          list_filter(toks, t -> t IN ($stops)), inj_stops)))::BIGINT AS n_stop
       |      FROM c),
       |g AS (SELECT doc_id, n_words, n_lines, n_bullet, n_ellipsis, n_sym,
       |        sum_len, n_alpha, n_stop,
       |        (n_words >= $MinWords AND n_words <= $MaxWords) AS ok_words,
       |        (sum_len >= n_words * 3 AND sum_len <= n_words * 10) AS ok_meanlen,
       |        (n_sym * 10 <= n_words) AS ok_sym,
       |        (n_bullet * 10 <= n_lines * 9) AS ok_bullet,
       |        (n_ellipsis * 10 <= n_lines * 3) AS ok_ellipsis,
       |        (n_alpha * 5 >= n_words * 4) AS ok_alpha,
       |        (n_stop >= 2) AS ok_stop
       |      FROM m)
       |SELECT *, (ok_words AND ok_meanlen AND ok_sym AND ok_bullet
       |           AND ok_ellipsis AND ok_alpha AND ok_stop) AS gopher_pass
       |FROM g ORDER BY doc_id""".stripMargin
  }
}
