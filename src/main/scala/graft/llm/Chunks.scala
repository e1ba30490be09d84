package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.PortableHash

/** Content-defined chunking (CDC) dedup — the shift-robust granularity
  * completing the engine's duplication spectrum: whole docs ([[Dedup]]),
  * ALIGNED lines ([[Lines]] — cheapest, breaks under offset), stride-1
  * rolling windows ([[Substring]] — offset-proof, tokens×1 rows), and CDC
  * chunks (offset-proof at ~tokens/D rows): boundaries are declared wherever
  * a TOKEN's hash lands in the cut class (`phash(tok) ≡ 0 mod D` — the
  * gear/Rabin CDC idea reduced to its declarative core), so inserting a
  * prefix shifts every position but moves NO downstream boundary — the
  * exact failure mode that makes aligned-line dedup miss re-crawls with
  * injected headers.
  *
  * The storage-systems CDC refinement (min/max chunk clamps) is
  * deliberately absent: clamped boundaries depend on the PREVIOUS cut
  * (a sequential fold — not declarable, not shift-local), while the pure
  * cut-class rule keeps every boundary a per-token predicate — one
  * explode, one doc-bounded prefix-sum window, one hash aggregate, and
  * chunk length stays D in expectation by the hash's uniformity (the
  * occasional tiny/huge chunk is the documented trade).
  *
  * Reference scope: no text operators in the reference (its corpus analog
  * is occurrence records, `MapBuilder.java:134-174`); LLM-pipeline
  * extension.
  */
object Chunks {

  /** Expected chunk length in tokens (the cut-class density 1/D). */
  val D = 8

  /** Hash seed for the cut class (distinct from every other phash use). */
  val CutSeed = 0x5cdc

  /** (doc_id, chunk_id, n_tok, ch) — one row per content-defined chunk:
    * `chunk_id` is the per-doc running cut count (0-based), `ch` the md5
    * of the space-joined chunk tokens (the [[Substring.windowFrame]]
    * hashing convention). Empty docs emit nothing. The prefix-sum window
    * is PER-DOC (doc-bounded partitions — the `doc_dup_spans` islands
    * precedent, never a global window).
    */
  def chunkFrame(docs: DataFrame): DataFrame = {
    val t = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .filter(col("n_tok") > 0)
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    t.select(col("doc_id"),
        explode(sequence(lit(0L), col("n_tok") - 1)).as("pos"),
        col("toks"))
      .select(col("doc_id"), col("pos"),
        element_at(col("toks"), (col("pos") + 1).cast("int")).as("tok"))
      .withColumn("cut",
        when(pmod(PortableHash.phashSeed(CutSeed, col("tok")), lit(D.toLong)) === 0, 1L)
          .otherwise(0L))
      .withColumn("chunk_id", coalesce(sum(col("cut")).over(w), lit(0L)))
      .groupBy("doc_id", "chunk_id")
      .agg(count(lit(1)).as("n_tok"),
        md5(array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ").cast("binary")).as("ch"))
  }

  /** Duplicated-chunk postings: every chunk hash appearing in ≥ 2 DISTINCT
    * docs, with doc frequency, occurrence count, chunk length and the
    * min-id owner — [[Lines.postings]]' contract at the shift-robust
    * granularity.
    */
  def postings(docs: DataFrame): DataFrame =
    chunkFrame(docs)
      .groupBy("ch")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"),
        min(col("n_tok")).as("n_tok"),
        min(col("doc_id")).as("min_doc"))
      .filter(col("n_docs") >= 2)

  /** The doc's chunk hashes as ONE per-row array — [[chunkFrame]] without
    * the per-doc window (windows are stateful and append-illegal on a
    * stream; the [[graft.llm.Winnow]] `fingerprintsRowwise` split).
    * Interpreted HOF per row, acceptable on the ingest path where each
    * doc is touched once. Equality with [[chunkFrame]]'s per-doc multiset
    * is pinned in ChunksSpec.
    */
  def chunkHashesRowwise(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    val n = size(toks)
    // cut AFTER token i (a trailing cut at the last token closes the final
    // chunk and opens nothing — excluded, mirroring chunkFrame's grouping)
    val cuts = filter(sequence(lit(0), n - 1),
      i => pmod(PortableHash.phashSeed(CutSeed,
        element_at(toks, i + 1)), lit(D.toLong)) === 0 && i < n - 1)
    val starts = concat(array(lit(0)), transform(cuts, c => c + 1))
    val ends = concat(cuts, array(n - 1))
    when(n === 0, array().cast("array<string>"))
      .otherwise(zip_with(starts, ends, (s, e) =>
        md5(array_join(slice(toks, s + 1, e - s + 1), " ").cast("binary"))))
  }

  // ------------------------------------------------------------- oracles

  /** DuckDB mirror of [[chunkFrame]] as a CTE body (named `chks`). */
  def sqlChunkCte: String = {
    val toks = TextAnalysis.sqlTokens("text")
    val h = PortableHash.sqlPhashSeed(CutSeed, "tok")
    s"""t AS (SELECT doc_id, $toks AS toks FROM documents),
       |f AS (SELECT doc_id, toks FROM t WHERE len(toks) > 0),
       |p AS (SELECT doc_id, toks, unnest(range(len(toks)))::BIGINT AS pos FROM f),
       |tk AS (SELECT doc_id, pos, toks[(pos + 1)::INT] AS tok FROM p),
       |ct AS (SELECT doc_id, pos, tok,
       |         CASE WHEN $h % $D = 0 THEN 1 ELSE 0 END AS cut
       |       FROM tk),
       |ci AS (SELECT doc_id, pos, tok,
       |         coalesce(sum(cut) OVER (PARTITION BY doc_id ORDER BY pos
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS chunk_id
       |       FROM ct),
       |chks AS (SELECT doc_id, chunk_id, count(*)::BIGINT AS n_tok,
       |           md5(string_agg(tok, ' ' ORDER BY pos)) AS ch
       |         FROM ci GROUP BY 1, 2)""".stripMargin
  }

  /** DuckDB mirror of [[postings]]. */
  def sqlPostings: String =
    s"""WITH ${sqlChunkCte}
       |SELECT ch, count(DISTINCT doc_id)::BIGINT AS n_docs,
       |  count(*)::BIGINT AS n_occ, min(n_tok)::BIGINT AS n_tok,
       |  min(doc_id)::BIGINT AS min_doc
       |FROM chks GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
       |ORDER BY ch""".stripMargin
}
