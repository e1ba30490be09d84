package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.expr.PortableHash

/** Text-analysis primitives for training-data pipelines: normalization,
  * tokenization, shingling, language-ID heuristics, quality stats, simhash
  * and fingerprinting — all as native `Column` expressions so they run
  * inside whole-stage codegen over a 100 TB `documents` scan, with DuckDB
  * SQL mirrors for the correctness oracle.
  */
object TextAnalysis {

  /** Canonical normalization: lowercase, squeeze whitespace, trim. */
  def normText(c: Column): Column = lower(trim(regexp_replace(c, "\\s+", " ")))
  def sqlNormText(e: String): String =
    s"lower(trim(regexp_replace($e, '\\s+', ' ', 'g')))"

  /** Whitespace tokens of the normalized text (empty text → empty array). */
  def tokens(c: Column): Column = {
    val n = normText(c)
    when(length(n) === 0, array().cast("array<string>")).otherwise(split(n, " "))
  }
  def sqlTokens(e: String): String = {
    val n = sqlNormText(e)
    s"(CASE WHEN length($n) = 0 THEN [] ELSE string_split($n, ' ') END)"
  }

  /** Word n-gram shingles joined with spaces; fewer than n tokens → empty. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  def sqlShingles(toksE: String, n: Int): String =
    s"(CASE WHEN len($toksE) < $n THEN [] ELSE " +
      s"[array_to_string(($toksE)[i + 1 : i + $n], ' ') " +
      s" for i in range(0, len($toksE) - $n + 1)] END)"

  /** BPE-ish subtoken count: runs of letters, runs of digits, or any other
    * non-space char each count as one subtoken.
    */
  val SubtokenPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def subtokenCount(c: Column): Column =
    regexp_count(normText(c), lit(SubtokenPattern))
  def sqlSubtokenCount(e: String): String =
    s"len(regexp_extract_all(${sqlNormText(e)}, '$SubtokenPattern'))"

  /** Per-language stopword marker lists for the language-ID heuristic. */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "est"),
    "es" -> Seq("el", "los", "que", "una", "es", "las", "por"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht")
  )

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))
  private def sqlCountIn(toksE: String, words: Seq[String]): String =
    s"len(list_filter($toksE, t -> t IN (${words.map(w => s"'$w'").mkString(", ")})))"

  /** Language-ID heuristic: CJK codepoints → zh; else argmax stopword hits
    * (ties and zero hits → 'und'; argmax resolved in LangStopwords order).
    */
  def langId(c: Column): Column = {
    val toks = tokens(c)
    val scores = LangStopwords.map { case (l, ws) => l -> countIn(toks, ws) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
    // foldRight gives earlier entries priority on ties
    val cjk = regexp_count(c, lit("[\\x{4e00}-\\x{9fff}]")) > 0
    when(cjk, lit("zh")).otherwise(pick)
  }
  def sqlLangId(e: String): String = {
    val toksE = sqlTokens(e)
    val scores = TextAnalysis.LangStopwords.map { case (l, ws) => l -> sqlCountIn(toksE, ws) }
    val best = scores.map(_._2).reduceRight((a, b) => s"greatest($a, $b)")
    val pick = scores.foldRight("'und'") { case ((l, s), acc) =>
      s"(CASE WHEN $s = $best AND $best > 0 THEN '$l' ELSE $acc END)"
    }
    s"(CASE WHEN len(regexp_extract_all($e, '[\\x{4e00}-\\x{9fff}]')) > 0 THEN 'zh' ELSE $pick END)"
  }

  /** Scale form of [[langId]]: explode tokens once, four codegen'd
    * conditional sums + a CJK flag per id, argmax in the final projection —
    * the per-row form evaluates the token array through ~10 interpreted
    * lambdas (each score AND each tie-compare re-expands the tokens
    * subtree). Identical results ([[langId]] remains the spec; the oracle is
    * unchanged).
    */
  def langIdByKey(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      carry: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    val hitCols = LangStopwords.map { case (l, ws) =>
      sum(when(col("t").isInCollection(ws), 1L).otherwise(0L)).as(s"hits_$l")
    }
    val cjkCol = max(when(regexp_count(col("t"), lit("[\\x{4e00}-\\x{9fff}]")) > 0, 1)
      .otherwise(0)).as("cjk")
    val scores = LangStopwords.map { case (l, _) => l -> col(s"hits_$l") }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
    // `carry`: passenger columns kept through the aggregate (functionally
    // dependent on idCol) — grouping by them rides the same shuffle and
    // saves callers a join-back (which would re-scan the corpus).
    df.select(col(idCol) +: carry.map(col) :+
        explode_outer(tokens(col(textCol))).as("t"): _*)
      .groupBy(idCol, carry: _*)
      .agg(hitCols.head, (hitCols.tail :+ cjkCol): _*)
      .select(col(idCol) +: carry.map(col) :+
        when(col("cjk") === 1, lit("zh")).otherwise(pick).as("pred_lang"): _*)
  }

  /** 32-bit simhash over token multiset using the portable hash: bit i is
    * set when more token-hashes have bit i set than clear.
    */
  def simhash32(toks: Column): Column =
    aggregate(
      transform(sequence(lit(0), lit(31)), i => {
        // 2^i as exact long arithmetic (shiftleft/shiftright need literal
        // shift amounts; pow is exact here: i < 32, hashes < 2^32 < 2^53)
        val pow2i = pow(lit(2.0), i).cast("long")
        val score = aggregate(toks, lit(0L), (acc, t) =>
          acc + when(pmod(floor(PortableHash.phash(t) / pow2i).cast("long"), lit(2)) === 1, lit(1L))
            .otherwise(lit(-1L)))
        when(score > 0, pow2i).otherwise(lit(0L))
      }),
      lit(0L), (acc, b) => acc + b)
  /** Scale form of [[simhash32]]: explode tokens, hash each once (codegen
    * md5), then 32 codegen'd conditional sums per id — the per-row array
    * lambdas above run interpreted (~3 µs/element; measured 22 s at sf0.1 vs
    * ~2 s for this shape). Map-side partial sums make the id shuffle carry
    * 32 longs per document. Bit-identical to [[simhash32]].
    */
  def simhash32ByKey(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String)
      : org.apache.spark.sql.DataFrame =
    simhash32FromHashes(
      df.select(col(idCol), explode_outer(tokens(col(textCol))).as("t"))
        .select(col(idCol), PortableHash.phash(col("t")).as("h")),
      idCol)

  /** [[simhash32ByKey]]'s aggregation half over an already-exploded
    * (id, h) hash stream — shared with the multimodal perceptual hash,
    * whose "tokens" are payload chunks rather than words. `h` may be null
    * (empty inputs via explode_outer): null contributes no vote.
    */
  def simhash32FromHashes(hashed: org.apache.spark.sql.DataFrame, idCol: String)
      : org.apache.spark.sql.DataFrame = {
    val scores = (0 until 32).map { i =>
      sum(when(col("h").isNull, lit(0L))
        .otherwise(shiftright(col("h"), i).bitwiseAND(lit(1L)) * 2 - 1)).as(s"s_$i")
    }
    val hashBits = (0 until 32).map { i =>
      when(col(s"s_$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    hashed
      .groupBy(idCol)
      .agg(scores.head, scores.tail: _*)
      .select(col(idCol), hashBits.as("simhash"))
  }

  def sqlSimhash32(toksE: String): String = {
    val h = PortableHash.sqlPhash("t")
    s"""list_sum([
       |  CASE WHEN list_sum([CASE WHEN (($h // (1::BIGINT << i)) % 2) = 1 THEN 1 ELSE -1 END
       |                      for t in $toksE]) > 0
       |       THEN (1::BIGINT << i) ELSE 0 END
       |  for i in range(0, 32)])::BIGINT""".stripMargin
  }

  /** Composite quality score in [0, 1]: 0.3·length-saturation + 0.4·TTR +
    * 0.3·(1 − stopword ratio), rounded to 6 — the gate shared by
    * `doc_quality` and `corpus_clean`.
    */
  def qualityScore(c: Column): Column = {
    val toks = tokens(c)
    val nTok = size(toks)
    val ttr = when(nTok === 0, 0.0)
      .otherwise(size(array_distinct(toks)).cast("double") / nTok)
    val stopRatio = when(nTok === 0, 0.0)
      .otherwise(size(filter(toks, t => t.isInCollection(LangStopwords.head._2)))
        .cast("double") / nTok)
    round(lit(0.3) * least(nTok.cast("double") / 100.0, lit(1.0)) +
      lit(0.4) * ttr + lit(0.3) * (lit(1.0) - stopRatio), 6)
  }

  /** DuckDB mirror of [[qualityScore]] over a tokens-list SQL expression. */
  def sqlQualityScore(toksE: String): String = {
    val enStop = LangStopwords.head._2.map(w => s"'$w'").mkString(", ")
    s"round(0.3 * least(len($toksE)::DOUBLE / 100.0, 1.0) + " +
      s"0.4 * (CASE WHEN len($toksE) = 0 THEN 0.0 " +
      s"ELSE len(list_distinct($toksE))::DOUBLE / len($toksE) END) + " +
      s"0.3 * (1.0 - (CASE WHEN len($toksE) = 0 THEN 0.0 " +
      s"ELSE len(list_filter($toksE, x -> x IN ($enStop)))::DOUBLE / len($toksE) END)), 6)"
  }

  /** Top-k distinctive tokens per document by TF-IDF: the standard
    * "what makes this doc different" extractor (topic routing, boilerplate
    * spotting). Scale shape: one explode, a (doc, token) hash aggregate for
    * TF, a token-keyed aggregate for DF, and a shuffle join on token
    * (the DF table is vocabulary-sized — never broadcast-assumed); corpus
    * size N arrives via a 1-row broadcast cross join, and the ranking window
    * partitions by doc_id. Scores are rounded to 6 before ranking so both
    * engines rank identical values; ties break by token.
    */
  def tfidfTopK(docs: org.apache.spark.sql.DataFrame, k: Int)
      : org.apache.spark.sql.DataFrame = {
    // The TF frame feeds three consumers (DF aggregate, corpus-N scalar,
    // and the scoring join's probe side); un-checkpointed, each reference
    // re-runs the tokenize+explode+aggregate subtree - three corpus scans.
    // Materializing the token index once is the 100 TB shape (same pattern
    // as Dedup.SignatureIndex).
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .groupBy("doc_id", "t")
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val n = tf.select(countDistinct(col("doc_id")).as("n_docs"))
    val scored = tf.join(df, "t").crossJoin(broadcast(n))
      .withColumn("score_r",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score_r").desc, col("t"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("doc_id"), col("t").as("token"), col("tf"), col("df"),
        col("score_r"), col("rnk"))
  }

  /** DuckDB mirror of [[tfidfTopK]] over the `documents` view. */
  def sqlTfidfTopK(k: Int): String =
    s"""WITH tok AS (SELECT doc_id, unnest(${sqlTokens("text")}) AS t FROM documents),
       |tf AS (SELECT doc_id, t, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
       |df AS (SELECT t, count(*)::BIGINT AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(DISTINCT doc_id)::BIGINT AS n_docs FROM tf),
       |s AS (SELECT tf.doc_id, tf.t, tf.tf, df.df,
       |  round(tf.tf * ln(n.n_docs::DOUBLE / df.df), 6) AS score_r
       |  FROM tf JOIN df USING (t) CROSS JOIN n),
       |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score_r DESC, t) AS rnk
       |  FROM s)
       |SELECT doc_id, t AS token, tf, df, score_r, rnk FROM r WHERE rnk <= $k
       |ORDER BY doc_id, rnk""".stripMargin
}
