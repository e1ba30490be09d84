package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Streaming corpus admission: new documents arrive as a stream and are
  * admitted only if their content fingerprint is unknown to the STATIC
  * corpus index — the streaming twin of the exact layer of
  * [[graft.llm.Dedup.incremental]].
  *
  * The index side is a stream-STATIC left join (Structured Streaming joins
  * each micro-batch against the static frame with no streaming state at
  * all), so at 100 TB the index is the deduped corpus fingerprint table —
  * a parquet/bucketed table that the join shuffles against per batch; no
  * broadcast assumption, no watermark needed. In-stream duplicates are a
  * separate concern handled by `EventStream.dedupedStream`'s
  * watermark-bounded state.
  */
object DocStream {

  /** `newDocs` (streaming or batch: doc_id, text) filtered to fingerprints
    * absent from `index` (static: text). Emits (doc_id, text, fp).
    */
  def admit(newDocs: DataFrame, index: DataFrame): DataFrame =
    newDocs
      .withColumn("fp", Dedup.fingerprint(col("text")))
      .join(Dedup.indexFingerprints(index), Seq("fp"), "left_outer")
      .filter(col("known").isNull)
      .select("doc_id", "text", "fp")

  /** Streaming NEAR-dup probe — the LSH layer of
    * [[graft.llm.Dedup.incremental]] as a stream: each incoming doc's
    * banded signature (computed per-row, [[Dedup.bandedRowwise]] — no
    * stateful aggregate) probes the static index's occupancy-capped band
    * buckets, candidates verify by exact shingle-set Jaccard against the
    * static sets, and verified hits `(doc_id, near_id, band, jac_r)` with
    * `jac_r >= threshold` are emitted. Every join is stream-STATIC (legal
    * in append mode, no watermark, no streaming state); a pair sharing
    * several bands emits once per shared band (multiplicity ≤ numBands) —
    * dedup at the consumer if single rows are needed, the aggregate-free
    * shape is what keeps the stream stateless.
    *
    * 100 TB posture: the static side is [[Dedup.signatureIndex]] —
    * materialized ONCE through its checkpoint seam, so per-micro-batch
    * planning re-reads stored blocks, never re-tokenizes the corpus; the
    * stream side is linear in the batch. The in-stream-duplicate concern
    * stays with `EventStream.dedupedStream`, exactly as [[admit]] splits it.
    */
  def nearDupProbe(newDocs: DataFrame, index: DataFrame,
                   shingleSize: Int = 3, numPerms: Int = 16, numBands: Int = 4,
                   threshold: Double = 0.5): DataFrame = {
    val idx = Dedup.signatureIndex(index, shingleSize, numPerms, numBands)
    val capped = Dedup.cappedBuckets(idx.banded, Dedup.MaxBandBucket)
      .select(col("doc_id").as("near_id"), col("band"), col("bh"))
    val probes = Dedup.bandedRowwise(newDocs, shingleSize, numPerms, numBands)
    probes
      .join(capped, Seq("band", "bh"))
      .join(idx.sets.select(col("doc_id").as("near_id"), col("sh").as("r_sh")),
        Seq("near_id"))
      .select(col("doc_id"), col("near_id"), col("band"),
        round(size(array_intersect(col("sh"), col("r_sh"))).cast("double") /
          size(array_union(col("sh"), col("r_sh"))), 6).as("jac_r"))
      .filter(col("jac_r") >= threshold)
  }
}
