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
}
