package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The published C4 cleaning heuristics (Raffel et al. 2020, "Exploring
  * the Limits of Transfer Learning with a Unified Text-to-Text
  * Transformer", §2.2) — with [[Gopher]] the second canonical public
  * web-corpus filter a migrating curation pipeline expects to run:
  *
  *   - keep only lines ending in terminal punctuation (. ! ?)
  *   - keep only lines with ≥ 3 words
  *   - drop lines containing the word "javascript"
  *   - drop pages containing "lorem ipsum" or a curly brace
  *   - drop pages with fewer than 5 surviving sentences/lines
  *
  * Of the paper's remaining rules: three-sentence-span dedup across the
  * corpus is `substring_dedup`; the bad-word-list page filter and the
  * langdetect-English page filter are NOT implemented here (the list is
  * an external artifact and the fixture has no real language signal —
  * `pii_redact`/`lang_id` hold the machinery either would plug into).
  *
  * Line view: the synthetic fixture is flat, so lines derive exactly as in
  * [[Gopher]] (wrap at [[Gopher.LineWidth]] tokens) and the line/page
  * attributes the rules read are hash-gated: `(doc_id·31 + line) mod 4` =
  * 0/1/2 → the line ends in . / ! / ? , 3 → the line contains
  * "javascript" (and no terminal punctuation); `doc_id mod 17 = 0` → the
  * page contains "lorem ipsum", `doc_id mod 23 = 3` → it contains a curly
  * brace. On a real corpus the same counters come from the document's own
  * lines; the decoration only makes the gates non-degenerate here.
  *
  * All counters are exact integers; the whole verdict is one map-only
  * projection per row (higher-order functions over the line-id array, no
  * explode, no shuffle) — at 100 TB this pipelines into the ingest scan.
  */
object C4 {

  val MinLineWords = 3
  val MinSentences = 5

  def gates(df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
            carry: Seq[String] = Nil): DataFrame = {
    val id = col(idCol)
    val cc = carry.map(col)
    val w = Gopher.LineWidth
    // Materialize the token count FIRST: the line lambdas below reference
    // it per array element, and an inlined size(split(regexp…)) would
    // re-tokenize the document once per line per lambda (measured 5.7 s vs
    // 1.0 s at sf0.1). CollapseProject keeps a non-cheap multi-referenced
    // projection as a real attribute, so `n` is computed once per row.
    val staged = df.select(id +: cc :+
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("n"): _*)
    val n = col("n")
    val nLines = ((n + w - 1) / w).cast("long")
    val lineIds = when(nLines === 0, array().cast("array<long>"))
      .otherwise(sequence(lit(0L), nLines - 1))
    // words on line i: full width except the (possibly short) last line
    val lineWords = (i: Column) =>
      when(i < nLines - 1, lit(w.toLong)).otherwise(n - i * w)
    val keptIds = filter(lineIds, i =>
      pmod(id * 31 + i, lit(4L)) < 3 && lineWords(i) >= MinLineWords)
    val hasLorem = pmod(id, lit(17L)) === 0
    val hasBrace = pmod(id, lit(23L)) === 3
    staged.select(id +: cc :+ n.as("n_words") :+ nLines.as("n_lines") :+
        size(keptIds).cast("long").as("n_kept") :+
        aggregate(keptIds, lit(0L), (a, i) => a + lineWords(i)).as("kept_words") :+
        hasLorem.as("has_lorem") :+ hasBrace.as("has_brace"): _*)
      .withColumn("c4_pass",
        col("n_kept") >= MinSentences && !col("has_lorem") && !col("has_brace"))
  }

  /** DuckDB mirror of [[gates]] over the `documents` view. */
  def sqlGates: String = {
    val toks = TextAnalysis.sqlTokens("text")
    val w = Gopher.LineWidth
    s"""WITH t AS (SELECT doc_id, len($toks)::BIGINT AS n FROM documents),
       |l AS (SELECT doc_id, n, ((n + ${w - 1}) // $w)::BIGINT AS n_lines FROM t),
       |k AS (SELECT doc_id, n, n_lines,
       |        [CASE WHEN i < n_lines - 1 THEN $w ELSE n - i * $w END
       |           for i in range(n_lines)
       |           if (doc_id*31 + i) % 4 < 3
       |          AND (CASE WHEN i < n_lines - 1 THEN $w ELSE n - i * $w END)
       |                >= $MinLineWords] AS kept_lens
       |      FROM l),
       |m AS (SELECT doc_id, n AS n_words, n_lines,
       |        len(kept_lens)::BIGINT AS n_kept,
       |        coalesce(list_sum(kept_lens), 0)::BIGINT AS kept_words,
       |        (doc_id % 17 = 0) AS has_lorem,
       |        (doc_id % 23 = 3) AS has_brace
       |      FROM k)
       |SELECT *, (n_kept >= $MinSentences AND NOT has_lorem AND NOT has_brace)
       |  AS c4_pass
       |FROM m ORDER BY doc_id""".stripMargin
  }
}
