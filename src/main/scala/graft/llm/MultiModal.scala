package graft.llm

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata.
  *
  * The pattern for image/audio/video at 100 TB: carry the payload as a
  * `binary` column next to a metadata struct, and run decode / feature
  * extraction per-partition (batched, library handles reused across rows —
  * the Scala analog of `mapInPandas`). The decode step itself is STUBBED
  * deterministically (no media libs in this container): real byte length +
  * an md5 head-fingerprint stand in for decoded features, so the Spark-side
  * plumbing — schema, partitioning, batch shape — is real and oracle-checked
  * while the codec is swappable.
  */
object MultiModal {

  case class Payload(doc_id: Long, bin: Array[Byte], source: String, n_chars: Long)
  case class Features(doc_id: Long, byte_len: Int, head_md5: String, source: String)

  /** documents → payload frame: text bytes as the opaque binary column. */
  def payloads(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("bin"),
      col("source"), col("n_chars"))

  /** Per-partition "decode" + feature extraction. One MessageDigest per
    * partition (the expensive-decoder-reuse pattern), rows streamed.
    */
  def extractFeatures(payloads: Dataset[Payload])(implicit spark: SparkSession): Dataset[Features] = {
    import spark.implicits._
    payloads.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5") // per-partition decoder handle
      it.map { p =>
        md.reset()
        // "decode" the payload, then fingerprint the first 16 characters of
        // the decoded content (character-based so the oracle can recompute
        // it for non-ASCII payloads — DuckDB 1.0 cannot hash byte slices)
        val head = new String(p.bin, java.nio.charset.StandardCharsets.UTF_8)
          .take(16).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val hex = md.digest(head).map("%02x".format(_)).mkString
        Features(p.doc_id, p.bin.length, hex, p.source)
      }
    }
  }

  def features(docs: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    extractFeatures(payloads(docs).as[Payload])(spark).toDF()
  }
}
