package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING: the first `k` greedy merge
  * rounds, distributed, with a DuckDB mirror that replays every round
  * CTE-for-CTE.
  *
  * BPE training operates on the VOCABULARY (unique word, corpus
  * frequency), not on occurrences — by Zipf the vocab is orders of
  * magnitude smaller than the corpus, so after the one corpus-wide
  * word-count aggregation every round runs on a small frame. Each round:
  * count adjacent symbol pairs weighted by word frequency, pick the most
  * frequent pair (total order: freq desc, pair asc), merge it everywhere,
  * repeat. The merge table (rank, pair, freq) IS the tokenizer artifact.
  *
  * Words are carried as SPACE-JOINED symbol strings, and a merge is
  * `replace(' ' || w || ' ', ' a b ', ' ab ')` — left-to-right
  * non-overlapping replacement, which is exactly BPE's greedy-left merge
  * order, and a semantic both engines share (no array fold needed, no
  * interpreted lambdas on the hot path).
  *
  * Scale: one explode + hash-agg over the corpus (the same shape as
  * vocab_topk), then k rounds over the vocab frame; each round's pair
  * argmax is a 1-row TakeOrderedAndProject broadcast back by crossJoin —
  * the established totals pattern. The vocab frame is checkpointed per
  * round to keep the plan linear in k, not exponential.
  */
object Bpe {

  /** Corpus vocabulary with symbol-split words: (w, freq) where w is the
    * word's symbols joined by single spaces (initially its characters).
    */
  def vocab(docs: DataFrame): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      // 'abc' -> 'a b c': insert a space after every char, trim the tail
      .select(trim(regexp_replace(col("word"), "(.)", "$1 ")).as("w"), col("freq"))

  /** The top-1 adjacent symbol pair of a vocab frame, as a 1-row frame
    * (pair, pair_freq). Total order: freq desc, pair asc.
    */
  private def topPair(v: DataFrame): DataFrame =
    v.select(col("freq"),
        explode(TextAnalysis.shingles(split(col("w"), " "), 2)).as("pair"))
      .groupBy("pair").agg(sum("freq").as("pair_freq"))
      .orderBy(col("pair_freq").desc, col("pair"))
      .limit(1)

  /** The k training rounds: (merge table, final segmented vocab). */
  private def train(docs: DataFrame, k: Int): (DataFrame, DataFrame) = {
    var v = vocab(docs).localCheckpoint()
    var out: DataFrame = null
    for (r <- 1 to k) {
      val tp = topPair(v)
        .withColumn("m", regexp_replace(col("pair"), " ", ""))
        .localCheckpoint() // one argmax job per round, read twice below
      val row = tp.select(lit(r).as("rank"), col("pair"), col("pair_freq"))
      out = if (out == null) row else out.union(row)
      // Merge exhaustion (advice finding, round 8): once every word is a
      // single symbol the top-pair frame is EMPTY, and a crossJoin against
      // it would silently wipe the vocab. Freeze the segmentation instead
      // (the SQL mirror's v$r falls back to v$(r-1) the same way); the
      // merge table just stops growing — parity in both engines.
      if (!tp.isEmpty) {
        v = v.crossJoin(broadcast(tp.select("pair", "m")))
          .select(trim(expr(
            "replace(' ' || w || ' ', ' ' || pair || ' ', ' ' || m || ' ')")).as("w"),
            col("freq"))
          .localCheckpoint()
      }
    }
    (out, v)
  }

  /** Train `k` merges over the documents corpus. Returns the merge table
    * (rank 1..k, pair, pair_freq) — deterministic on any topology.
    */
  def merges(docs: DataFrame, k: Int): DataFrame =
    train(docs, k)._1.orderBy("rank")

  /** The trained tokenizer as a lookup table: (word, n_sym) — each corpus
    * word with its symbol count under the k-merge segmentation. Applying
    * the tokenizer is then a plain equi-join on word: no merge replay per
    * document, no driver-side merge list.
    */
  def trainedVocab(docs: DataFrame, k: Int): DataFrame =
    train(docs, k)._2.select(
      regexp_replace(col("w"), " ", "").as("word"),
      size(split(col("w"), " ")).cast("long").as("n_sym"))

  /** Tokenize the corpus with the trained table: per document, word count
    * and BPE token count. The segmentation table is corpus-vocab-sized
    * (Zipf-small) and joins the exploded word stream on its natural key.
    */
  def applyTokenizer(docs: DataFrame, k: Int): DataFrame = {
    val seg = trainedVocab(docs, k)
    docs.select(col("doc_id"), explode_outer(TextAnalysis.tokens(col("text"))).as("word"))
      .join(seg, Seq("word"), "left")
      .groupBy("doc_id")
      .agg(count(col("word")).as("n_words"),
        coalesce(sum("n_sym"), lit(0L)).as("n_bpe_tokens"))
  }

  /** Tokenizer fertility per document: BPE pieces per word in exact
    * integer ppm (`n_bpe_tokens * 10^6 div n_words`) — the standard
    * tokenizer-quality metric (lower = the vocabulary compresses this doc
    * better; rising fertility on a domain slice means the tokenizer
    * under-serves it). Pure arithmetic over [[applyTokenizer]]'s output,
    * so the cost shape is identical: one vocab join + one doc aggregate.
    */
  def fertility(docs: DataFrame, k: Int): DataFrame =
    applyTokenizer(docs, k)
      .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"),
        when(col("n_words") === 0L, lit(0L))
          .otherwise(call_function("div", col("n_bpe_tokens") * lit(1000000L),
            col("n_words"))).as("fertility_ppm"))

  /** Corpus-level fertility at several merge-count PREFIXES of one
    * training run — the vocab-size elbow curve ("how many merges before
    * pieces-per-word flattens?") a tokenizer deployment reads to size its
    * vocabulary. One row per requested k: (k_merges, n_words,
    * n_bpe_tokens, fertility_ppm), n_words constant across rows by
    * construction (merges change segmentation, never word count).
    *
    * Cost shape: the whole sweep is ONE corpus word-count aggregate +
    * max(ks) vocab-frame merge rounds + |ks| aggregates of the Zipf-small
    * vocab frame — corpus totals come from Σ freq·n_sym over the VOCAB
    * (each word's occurrences share a segmentation), so no per-k corpus
    * join and no doc-level explode at any k. A 100 TB corpus pays the
    * word count once; everything after is vocabulary-sized.
    */
  def fertilitySweep(docs: DataFrame, ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks == ks.sorted && ks.head >= 0 &&
        ks.distinct == ks, // dup prefixes would emit once here, twice in SQL
      s"ks must be strictly ascending non-negative, got $ks")
    var v = vocab(docs).localCheckpoint()
    def totals(k: Int, vk: DataFrame): DataFrame =
      vk.select(col("freq"),
          size(split(col("w"), " ")).cast("long").as("n_sym"))
        .agg(lit(k.toLong).as("k_merges"),
          sum(col("freq")).as("n_words"),
          sum(col("freq") * col("n_sym")).as("n_bpe_tokens"))
    val rows = scala.collection.mutable.ListBuffer.empty[DataFrame]
    if (ks.head == 0) rows += totals(0, v)
    for (r <- 1 to ks.max) {
      val tp = topPair(v)
        .withColumn("m", regexp_replace(col("pair"), " ", ""))
        .localCheckpoint()
      // merge exhaustion: freeze the segmentation once the top-pair frame
      // is empty (see train()) — later prefix rows repeat the final vocab
      // totals instead of emitting NULLs from a wiped frame
      if (!tp.isEmpty) {
        v = v.crossJoin(broadcast(tp.select("pair", "m")))
          .select(trim(expr(
            "replace(' ' || w || ' ', ' ' || pair || ' ', ' ' || m || ' ')")).as("w"),
            col("freq"))
          .localCheckpoint()
      }
      if (ks.contains(r)) rows += totals(r, v)
    }
    rows.reduce(_ union _)
      .select(col("k_merges"), col("n_words"), col("n_bpe_tokens"),
        when(col("n_words") === 0L, lit(0L))
          .otherwise(call_function("div", col("n_bpe_tokens") * lit(1000000L),
            col("n_words"))).as("fertility_ppm"))
      .orderBy("k_merges")
  }

  /** DuckDB mirror of [[fertilitySweep]]: the shared training chain, one
    * vocab-level total per requested prefix.
    */
  def sqlFertilitySweep(ks: Seq[Int]): String = {
    val rows = ks.map { k =>
      s"""SELECT ${k}::BIGINT AS k_merges, sum(freq)::BIGINT AS n_words,
         |  sum(freq * len(string_split(w, ' ')))::BIGINT AS n_bpe_tokens
         |FROM v$k""".stripMargin
    }.mkString("\n", "\nUNION ALL\n", "")
    s"""${sqlTrainCtes(ks.max)},
       |sw AS ($rows)
       |SELECT k_merges, n_words, n_bpe_tokens,
       |  (CASE WHEN n_words = 0 THEN 0
       |        ELSE (n_bpe_tokens * 1000000) // n_words END)::BIGINT AS fertility_ppm
       |FROM sw ORDER BY k_merges""".stripMargin
  }

  /** DuckDB mirror of [[fertility]] (nested WITH — legal in DuckDB). */
  def sqlFertility(k: Int): String =
    s"""WITH ap AS (${sqlApply(k)})
       |SELECT doc_id, n_words, n_bpe_tokens,
       |  (CASE WHEN n_words = 0 THEN 0
       |        ELSE (n_bpe_tokens * 1000000) // n_words END)::BIGINT AS fertility_ppm
       |FROM ap ORDER BY doc_id""".stripMargin

  /** The k training rounds as a DuckDB CTE chain body
    * (v0 → p1 → v1 → … → pk → vk). `TextAnalysis.sqlTokens`/`sqlShingles`
    * keep tokenization and pair extraction identical to the engine.
    */
  private def sqlTrainCtes(k: Int): String = {
    val toks = TextAnalysis.sqlTokens("text")
    val sb = new StringBuilder
    sb.append(
      s"""WITH v0 AS (
         |  SELECT trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS w,
         |         count(*)::BIGINT AS freq
         |  FROM (SELECT unnest($toks) AS word FROM documents) GROUP BY 1)""".stripMargin)
    for (r <- 1 to k) {
      val prev = s"v${r - 1}"
      val pairs = TextAnalysis.sqlShingles(s"string_split(w, ' ')", 2)
      sb.append(
        s""",
           |p$r AS (
           |  SELECT pair, sum(freq)::BIGINT AS pair_freq
           |  FROM (SELECT freq, unnest($pairs) AS pair FROM $prev)
           |  GROUP BY 1 ORDER BY pair_freq DESC, pair LIMIT 1),
           |v$r AS (
           |  SELECT trim(replace(' ' || w || ' ', ' ' || p$r.pair || ' ',
           |           ' ' || replace(p$r.pair, ' ', '') || ' ')) AS w, freq
           |  FROM $prev, p$r
           |  UNION ALL
           |  SELECT w, freq FROM $prev
           |  WHERE NOT EXISTS (SELECT 1 FROM p$r))""".stripMargin)
    }
    sb.toString
  }

  /** DuckDB mirror of [[merges]]: UNION ALL of the per-round argmax rows. */
  def sqlMerges(k: Int): String =
    sqlTrainCtes(k) + "\n" + (1 to k)
      .map(r => s"SELECT $r AS rank, pair, pair_freq FROM p$r")
      .mkString("", "\nUNION ALL\n", "\nORDER BY rank")

  /** DuckDB mirror of [[applyTokenizer]]. */
  def sqlApply(k: Int): String = {
    val toks = TextAnalysis.sqlTokens("text")
    sqlTrainCtes(k) +
      s""",
         |seg AS (SELECT replace(w, ' ', '') AS word,
         |          len(string_split(w, ' '))::BIGINT AS n_sym FROM v$k),
         |dw AS (SELECT doc_id, unnest($toks) AS word FROM documents)
         |SELECT d.doc_id, count(dw.word)::BIGINT AS n_words,
         |  coalesce(sum(seg.n_sym), 0)::BIGINT AS n_bpe_tokens
         |FROM documents d
         |  LEFT JOIN dw ON dw.doc_id = d.doc_id
         |  LEFT JOIN seg ON seg.word = dw.word
         |GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
