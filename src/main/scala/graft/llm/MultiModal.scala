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
        // "decode" the payload, then fingerprint the first 16 CODE POINTS of
        // the decoded content (code-point-based, not UTF-16 units, so it
        // matches the oracle's substr(text,1,16) even for astral-plane
        // characters; character-based because DuckDB 1.0 cannot hash byte
        // slices)
        val s = new String(p.bin, java.nio.charset.StandardCharsets.UTF_8)
        val nCp = math.min(16, s.codePointCount(0, s.length))
        val head = s.substring(0, s.offsetByCodePoints(0, nCp))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
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
