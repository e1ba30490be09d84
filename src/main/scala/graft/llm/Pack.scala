package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.expr.PortableHash

/** GPT-style sequence packing: documents are concatenated in a
  * deterministic order and cut into fixed-length token windows — the step
  * that turns a filtered corpus into training sequences. A document
  * straddling a window boundary is SPLIT across consecutive sequences
  * (concatenate-then-chunk, as GPT-2/3 pipelines pack), so the output maps
  * each document to every sequence it feeds: `(bucket, seq, doc_id,
  * tok_start, tok_len)` with `tok_start` the slice offset inside the doc.
  *
  * Scale shape: a GLOBAL concatenation order would be a single-partition
  * window — instead docs hash into `buckets` independent streams
  * (`pmod(phash(doc_id), buckets)`), each packed by a PARTITIONED window
  * cumulative sum; the per-sequence explode fans out at most
  * `ceil(n_tok / seqLen) + 1` rows per doc. Bucket count scales with the
  * corpus (each bucket is one reducer's worth of window state); packing is
  * deterministic on any topology because bucket and order are hash/id
  * derived, never partition-derived.
  *
  * Sequence ids use exact long division (`div`), so Spark and DuckDB's
  * `x // L` agree bit-for-bit at any corpus size; `seqLen` is kept a power
  * of two as a layout convention (aligned, cache-friendly chunks).
  */
object Pack {

  val SeqLen = 256
  val Buckets = 8

  /** Target docs per pack bucket for the corpus-scaled bucket count. The
    * bucket running-sum window is ONE task per bucket, so a FIXED bucket
    * count caps packing parallelism and goes super-linear as the corpus
    * grows (measured 316× wall at 100× data with 8 buckets, BASELINE.md
    * round-5 study); [[autoBuckets]] keeps per-bucket rows bounded instead,
    * the same scaling move as `Similarity.autoBitsPerBand`.
    */
  val DocsPerBucket = 4096L

  /** Corpus-scaled bucket count: `max(Buckets, ceil(nDocs/DocsPerBucket))`
    * — exact integer math, mirrored by [[sqlAutoBuckets]] so oracles replay
    * the identical count at any scale.
    */
  def autoBuckets(nDocs: Long): Int =
    math.max(Buckets.toLong, (nDocs + DocsPerBucket - 1) / DocsPerBucket).toInt

  /** DuckDB twin of [[autoBuckets]] over the `documents` table, as a scalar
    * subquery usable wherever a bucket-count literal goes.
    */
  val sqlAutoBuckets: String =
    s"(SELECT greatest($Buckets, (count(*) + ${DocsPerBucket - 1}) // $DocsPerBucket) FROM documents)"

  private def bucketOf(docId: Column, buckets: Int): Column =
    pmod(PortableHash.phash(concat(lit("pack:"), docId.cast("string"))), lit(buckets))

  def sequences(docs: DataFrame, seqLen: Int = SeqLen,
                buckets: Int = Buckets): DataFrame =
    slices(docs, seqLen, buckets)
      .select("bucket", "seq", "doc_id", "tok_start", "tok_len")

  /** The slice chain shared by [[sequences]] and [[boundaries]]:
    * additionally carries `s_start`, the slice's offset WITHIN its
    * sequence (what an attention mask is written in).
    */
  private def slices(docs: DataFrame, seqLen: Int, buckets: Int): DataFrame = {
    require(seqLen > 0 && (seqLen & (seqLen - 1)) == 0, "seqLen must be a power of two")
    val base = docs
      .select(col("doc_id"), size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("bucket", bucketOf(col("doc_id"), buckets))
    val w = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = base
      .withColumn("end_off", sum("n_tok").over(w))
      .withColumn("start_off", col("end_off") - col("n_tok"))
    // exact long division (offsets are non-negative, so div == floor) —
    // floor(x / L) through doubles would lose exactness past 2^53 total
    // corpus tokens; DuckDB's `//` is exact integer floor division too
    val firstSeq = call_function("div", col("start_off"), lit(seqLen.toLong))
    val lastSeq = call_function("div", col("end_off") - 1, lit(seqLen.toLong))
    offs
      .withColumn("seq", explode(sequence(firstSeq, lastSeq)))
      .withColumn("o_start", greatest(col("start_off"), col("seq") * seqLen))
      .withColumn("o_end", least(col("end_off"), (col("seq") + 1) * seqLen))
      .select(col("bucket"), col("seq"), col("doc_id"),
        (col("o_start") - col("start_off")).as("tok_start"),
        (col("o_end") - col("o_start")).as("tok_len"),
        (col("o_start") - col("seq") * seqLen).as("s_start"))
  }

  /** Attention-mask boundary metadata per packed sequence — the sidecar a
    * training loader needs to BLOCK cross-document attention inside a
    * packed window (the packing papers' "document masking"): per (bucket,
    * seq), the doc count, filled token count, and the ordered boundary
    * list `s_start:len:doc_id` (offsets WITHIN the sequence). The group
    * payload is ≤ seqLen slices by construction, so the sorted-collect is
    * bounded like [[payloads]]'.
    */
  def boundaries(docs: DataFrame, seqLen: Int = SeqLen,
                 buckets: Int = Buckets): DataFrame =
    slices(docs, seqLen, buckets)
      .groupBy("bucket", "seq")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok_len")).as("n_tok"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("s_start"), col("tok_len"), col("doc_id")))),
            s => concat_ws(":", s.getField("s_start"), s.getField("tok_len"),
              s.getField("doc_id"))),
          ",").as("boundaries"))

  /** Shared oracle CTE body: `pk` = (bucket, seq, doc_id, tok_start,
    * tok_len), the [[sequences]] output.
    */
  private def sqlPackCtes(seqLen: Int, bucketsE: String): String = {
    val ph = PortableHash.sqlPhash("('pack:' || doc_id::VARCHAR)")
    s"""t AS (
       |  SELECT doc_id, len(${TextAnalysis.sqlTokens("text")})::BIGINT AS n_tok,
       |         ((($ph % $bucketsE) + $bucketsE) % $bucketsE) AS bucket
       |  FROM documents
       |),
       |o AS (
       |  SELECT doc_id, n_tok, bucket,
       |         sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
       |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS end_off
       |  FROM t WHERE n_tok > 0
       |),
       |e AS (SELECT *, end_off - n_tok AS start_off FROM o),
       |x AS (
       |  SELECT bucket, doc_id, start_off, end_off,
       |         unnest(range(start_off // $seqLen, (end_off - 1) // $seqLen + 1)) AS seq
       |  FROM e
       |),
       |pk AS (
       |  SELECT bucket::BIGINT AS bucket, seq::BIGINT AS seq, doc_id,
       |         (greatest(start_off, seq * $seqLen) - start_off)::BIGINT AS tok_start,
       |         (least(end_off, (seq + 1) * $seqLen) - greatest(start_off, seq * $seqLen))::BIGINT AS tok_len
       |  FROM x
       |)""".stripMargin
  }

  /** DuckDB mirror of [[sequences]] over the `documents` view. */
  def sqlSequences(seqLen: Int = SeqLen, bucketsE: String = sqlAutoBuckets): String =
    s"""WITH ${sqlPackCtes(seqLen, bucketsE)}
       |SELECT bucket, seq, doc_id, tok_start, tok_len FROM pk
       |ORDER BY bucket, seq, doc_id""".stripMargin

  /** DuckDB mirror of [[boundaries]]: `pk` extended with the within-seq
    * offset, aggregated in slice order.
    */
  def sqlBoundaries(seqLen: Int = SeqLen, bucketsE: String = sqlAutoBuckets): String =
    s"""WITH ${sqlPackCtes(seqLen, bucketsE)},
       |pb AS (
       |  SELECT bucket, seq, doc_id,
       |         (least(end_off, (seq + 1) * $seqLen)
       |           - greatest(start_off, seq * $seqLen))::BIGINT AS tok_len,
       |         (greatest(start_off, seq * $seqLen) - seq * $seqLen)::BIGINT AS s_start
       |  FROM x
       |)
       |SELECT bucket, seq, count(*)::BIGINT AS n_docs,
       |  sum(tok_len)::BIGINT AS n_tok,
       |  string_agg(s_start::VARCHAR || ':' || tok_len::VARCHAR || ':' || doc_id::VARCHAR,
       |             ',' ORDER BY s_start, tok_len, doc_id) AS boundaries
       |FROM pb GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Materialized packed sequences: for each (bucket, seq), the actual
    * token payload — doc slices concatenated in pack order — plus doc and
    * token counts. The group payload is bounded by `seqLen` tokens by
    * construction, so the sorted-collect is memory-safe at any corpus size
    * (same argument as the tile-feature cascades).
    */
  def payloads(docs: DataFrame, seqLen: Int = SeqLen,
               buckets: Int = Buckets): DataFrame = {
    val parts = sequences(docs, seqLen, buckets)
    val toks = docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    parts.join(toks, "doc_id")
      .select(col("bucket"), col("seq"), col("doc_id"), col("tok_len"),
        array_join(slice(col("toks"), (col("tok_start") + 1).cast("int"),
          col("tok_len").cast("int")), " ").as("piece"))
      .groupBy("bucket", "seq")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("tok_len").as("n_tok"),
        array_join(
          transform(array_sort(collect_list(struct(col("doc_id"), col("piece")))),
            x => x.getField("piece")),
          " ").as("text"))
  }

  /** Whole-document greedy packing with truncation — the no-split
    * alternative to [[sequences]] (T5-style packing: a document is never
    * split across sequences; a bin that overflows `seqLen` truncates its
    * tail). Each doc lands in the bin where its bucket-concatenation start
    * offset falls (`start_off div seqLen` — the distributed-window
    * equivalent of next-fit), then position and kept-token count are exact
    * within-bin running sums: `kept_tok = clamp(seqLen - pos_in_bin, 0,
    * n_tok)`. Emits (bucket, bin, doc_id, n_tok, pos_in_bin, kept_tok) —
    * kept_tok = 0 marks a fully-truncated doc, kept_tok < n_tok a tail
    * truncation; [[fillStats]] aggregates the waste report.
    *
    * Scale shape: the bucket running sum is the same autoBuckets-scaled
    * window as [[sequences]]; the within-bin pass partitions by
    * (bucket, bin) — strictly finer, so never the bottleneck.
    */
  def nosplit(docs: DataFrame, seqLen: Int = SeqLen,
              buckets: Int = Buckets): DataFrame = {
    require(seqLen > 0 && (seqLen & (seqLen - 1)) == 0, "seqLen must be a power of two")
    val base = docs
      .select(col("doc_id"), size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("bucket", bucketOf(col("doc_id"), buckets))
    val wB = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val binned = base
      .withColumn("start_off", sum("n_tok").over(wB) - col("n_tok"))
      .withColumn("bin", call_function("div", col("start_off"), lit(seqLen.toLong)))
    val wBin = Window.partitionBy("bucket", "bin").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binned
      .withColumn("pos_in_bin", sum("n_tok").over(wBin) - col("n_tok"))
      .select(col("bucket"), col("bin"), col("doc_id"), col("n_tok"), col("pos_in_bin"),
        greatest(lit(0L), least(lit(seqLen.toLong) - col("pos_in_bin"), col("n_tok")))
          .as("kept_tok"))
  }

  /** Per-bin fill/waste report over [[nosplit]]: doc count, offered and
    * kept token counts, fill and truncation in ppm of `seqLen` — the
    * packing-efficiency numbers that decide between no-split (cheap, lossy)
    * and concat-then-chunk (lossless, split-cost) for a corpus.
    */
  def fillStats(docs: DataFrame, seqLen: Int = SeqLen,
                buckets: Int = Buckets): DataFrame =
    nosplit(docs, seqLen, buckets)
      .groupBy("bucket", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("tok_offered"),
        sum("kept_tok").as("tok_kept"))
      .select(col("bucket"), col("bin"), col("n_docs"), col("tok_offered"),
        col("tok_kept"),
        expr(s"(tok_kept * 1000000) div $seqLen").as("fill_ppm"),
        expr(s"((tok_offered - tok_kept) * 1000000) div $seqLen").as("trunc_ppm"))

  /** Packing-config sweep: for each candidate `seqLen`, the corpus-level
    * cost of BOTH packing styles — no-split truncation loss (tokens cut at
    * bin boundaries, docs fully dropped) and concat-then-chunk padding loss
    * (the final partial sequence per bucket) — so the config choice
    * (length × style) is one report, the same tuning-sweep shape as
    * `quality_sweep`/`lsh_param_sweep`.
    *
    * Scale shape: ONE tokenize + ONE bucket-cumulative-sum pass produces the
    * checkpointed (bucket, start_off, n_tok) frame; each config then costs
    * one (bucket, bin)-partitioned aggregation over that narrow frame — no
    * re-tokenize, no re-shuffle of the wide corpus. `pos_in_bin` is
    * recovered as `start_off - min(start_off) over (bucket, bin)` (bins
    * tile the concatenation stream contiguously), so the per-config pass
    * needs no second running sum.
    */
  def sweep(docs: DataFrame, seqLens: Seq[Int] = SweepLens,
            buckets: Int = Buckets): DataFrame = {
    seqLens.foreach(l => require(l > 0 && (l & (l - 1)) == 0, "seqLen must be a power of two"))
    val base = docs
      .select(col("doc_id"), size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("bucket", bucketOf(col("doc_id"), buckets))
    val wB = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = base
      .withColumn("start_off", sum("n_tok").over(wB) - col("n_tok"))
      .select("bucket", "start_off", "n_tok")
      .localCheckpoint()
    // per-bucket totals: the split-style waste is only the final partial
    // sequence of each bucket stream — a `buckets`-row frame, reused per L
    val bucketTok = offs.groupBy("bucket").agg(sum("n_tok").as("btok"))
      .localCheckpoint()
    seqLens.map { sl =>
      val l = lit(sl.toLong)
      val wBin = Window.partitionBy("bucket", "bin")
      val kept = offs
        .withColumn("bin", call_function("div", col("start_off"), l))
        .withColumn("pos_in_bin", col("start_off") - min("start_off").over(wBin))
        .withColumn("kept_tok", greatest(lit(0L), least(l - col("pos_in_bin"), col("n_tok"))))
      val perBin = kept.groupBy("bucket", "bin")
        .agg(sum("n_tok").as("off_"), sum("kept_tok").as("kept_"),
          sum(when(col("kept_tok") === 0L, 1L).otherwise(0L)).as("drop_"))
      val nosplitRow = perBin.agg(
        count(lit(1)).as("n_bins"), sum("off_").as("tok_offered"),
        sum("kept_").as("tok_kept"), sum("drop_").as("docs_dropped"))
      val splitRow = bucketTok.agg(
        sum(call_function("div", col("btok") + (sl - 1).toLong, l)).as("split_seqs"),
        sum(call_function("div", col("btok") + (sl - 1).toLong, l) * l - col("btok"))
          .as("split_pad"))
      nosplitRow.crossJoin(splitRow) // 1 row × 1 row
        .select(lit(sl).as("seq_len"),
          col("n_bins"), col("tok_offered"), col("tok_kept"), col("docs_dropped"),
          expr("((tok_offered - tok_kept) * 1000000) div tok_offered").as("trunc_ppm"),
          col("split_seqs"),
          expr(s"(split_pad * 1000000) div (split_seqs * $sl)").as("split_pad_ppm"))
    }.reduce(_.union(_)).orderBy("seq_len")
  }

  val SweepLens: Seq[Int] = Seq(64, 128, 256, 512, 1024)

  /** DuckDB mirror of [[sweep]]. */
  def sqlSweep(seqLens: Seq[Int] = SweepLens, bucketsE: String = sqlAutoBuckets): String = {
    val ph = PortableHash.sqlPhash("('pack:' || doc_id::VARCHAR)")
    val branches = seqLens.map { l =>
      s"""SELECT $l::INTEGER AS seq_len,
         |  (SELECT count(*) FROM (SELECT bucket, bin FROM k$l GROUP BY 1, 2))::BIGINT AS n_bins,
         |  (SELECT sum(n_tok) FROM k$l)::BIGINT AS tok_offered,
         |  (SELECT sum(kept_tok) FROM k$l)::BIGINT AS tok_kept,
         |  (SELECT count(*) FROM k$l WHERE kept_tok = 0)::BIGINT AS docs_dropped,
         |  (SELECT ((sum(n_tok) - sum(kept_tok)) * 1000000) // sum(n_tok) FROM k$l)::BIGINT AS trunc_ppm,
         |  (SELECT sum((btok + ${l - 1}) // $l) FROM bt)::BIGINT AS split_seqs,
         |  (SELECT (sum((btok + ${l - 1}) // $l * $l - btok) * 1000000)
         |     // (sum((btok + ${l - 1}) // $l) * $l) FROM bt)::BIGINT AS split_pad_ppm""".stripMargin
    }.mkString("\nUNION ALL\n")
    val keptCtes = seqLens.map { l =>
      s"""k$l AS (
         |  SELECT bucket, start_off // $l AS bin, n_tok,
         |    greatest(0, least($l - (start_off - min(start_off)
         |      OVER (PARTITION BY bucket, start_off // $l)), n_tok))::BIGINT AS kept_tok
         |  FROM o
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH t AS (
       |  SELECT doc_id, len(${TextAnalysis.sqlTokens("text")})::BIGINT AS n_tok,
       |         ((($ph % $bucketsE) + $bucketsE) % $bucketsE) AS bucket
       |  FROM documents
       |),
       |o AS (
       |  SELECT doc_id, n_tok, bucket,
       |         (sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)::BIGINT
       |           AS start_off
       |  FROM t WHERE n_tok > 0
       |),
       |bt AS (SELECT bucket, sum(n_tok)::BIGINT AS btok FROM o GROUP BY 1),
       |$keptCtes
       |SELECT * FROM ($branches) ORDER BY seq_len""".stripMargin
  }

  /** Shared oracle CTE body for the no-split packing: `ns` = (bucket, bin,
    * doc_id, n_tok, pos_in_bin, kept_tok), the [[nosplit]] output.
    */
  private def sqlNosplitCtes(seqLen: Int, bucketsE: String): String = {
    val ph = PortableHash.sqlPhash("('pack:' || doc_id::VARCHAR)")
    s"""t AS (
       |  SELECT doc_id, len(${TextAnalysis.sqlTokens("text")})::BIGINT AS n_tok,
       |         ((($ph % $bucketsE) + $bucketsE) % $bucketsE) AS bucket
       |  FROM documents
       |),
       |o AS (
       |  SELECT doc_id, n_tok, bucket,
       |         (sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)::BIGINT
       |           AS start_off
       |  FROM t WHERE n_tok > 0
       |),
       |b AS (SELECT *, start_off // $seqLen AS bin FROM o),
       |ns AS (
       |  SELECT bucket::BIGINT AS bucket, bin::BIGINT AS bin, doc_id, n_tok,
       |         (sum(n_tok) OVER (PARTITION BY bucket, bin ORDER BY doc_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)::BIGINT
       |           AS pos_in_bin,
       |         greatest(0, least($seqLen - (sum(n_tok) OVER (PARTITION BY bucket, bin
       |            ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |            - n_tok), n_tok))::BIGINT AS kept_tok
       |  FROM b
       |)""".stripMargin
  }

  /** DuckDB mirror of [[nosplit]]. */
  def sqlNosplit(seqLen: Int = SeqLen, bucketsE: String = sqlAutoBuckets): String =
    s"""WITH ${sqlNosplitCtes(seqLen, bucketsE)}
       |SELECT bucket, bin, doc_id, n_tok, pos_in_bin, kept_tok FROM ns
       |ORDER BY bucket, bin, doc_id""".stripMargin

  /** DuckDB mirror of [[fillStats]]. */
  def sqlFillStats(seqLen: Int = SeqLen, bucketsE: String = sqlAutoBuckets): String =
    s"""WITH ${sqlNosplitCtes(seqLen, bucketsE)}
       |SELECT bucket, bin, count(*)::BIGINT AS n_docs,
       |  sum(n_tok)::BIGINT AS tok_offered, sum(kept_tok)::BIGINT AS tok_kept,
       |  (sum(kept_tok) * 1000000 // $seqLen)::BIGINT AS fill_ppm,
       |  ((sum(n_tok) - sum(kept_tok)) * 1000000 // $seqLen)::BIGINT AS trunc_ppm
       |FROM ns GROUP BY 1, 2
       |ORDER BY bucket, bin""".stripMargin

  /** DuckDB mirror of [[payloads]]. */
  def sqlPayloads(seqLen: Int = SeqLen, bucketsE: String = sqlAutoBuckets): String =
    s"""WITH ${sqlPackCtes(seqLen, bucketsE)},
       |tk AS (SELECT doc_id, ${TextAnalysis.sqlTokens("text")} AS toks FROM documents),
       |pc AS (
       |  SELECT bucket, seq, pk.doc_id, tok_len,
       |         array_to_string(toks[tok_start + 1 : tok_start + tok_len], ' ') AS piece
       |  FROM pk JOIN tk ON pk.doc_id = tk.doc_id
       |)
       |SELECT bucket, seq, count(*)::BIGINT AS n_docs, sum(tok_len)::BIGINT AS n_tok,
       |       string_agg(piece, ' ' ORDER BY doc_id) AS text
       |FROM pc GROUP BY 1, 2
       |ORDER BY bucket, seq""".stripMargin
}
