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

  case class Frames(doc_id: Long, n_frames: Int, frames_md5: String, resize_md5: String)

  /** Frame-sampling + resize, stubbed deterministically over the decoded
    * payload (media libs absent — SURVEY §7.5): a "frame" is a 64-code-point
    * window every `FrameStride` code points (≤ `MaxFrames` frames), the
    * "resize" is every `ResizeStep`-th code point of the first 512 — the
    * per-partition batch shape, code-point windowing and digest plumbing are
    * real and oracle-checked; a production build swaps [[frameOf]]/
    * [[resizeOf]] for the actual codec. Code-point (not byte) arithmetic so
    * the DuckDB oracle recomputes identical windows via substr.
    */
  val FrameStride = 256
  val FrameLen = 64
  val MaxFrames = 4
  val ResizeStep = 4
  val ResizeSpan = 512

  private def cpSubstring(s: String, fromCp: Int, lenCp: Int): String = {
    val total = s.codePointCount(0, s.length)
    if (fromCp >= total) ""
    else {
      val a = s.offsetByCodePoints(0, fromCp)
      val b = s.offsetByCodePoints(0, math.min(total, fromCp + lenCp))
      s.substring(a, b)
    }
  }

  private[llm] def frameOf(decoded: String, f: Int): String =
    cpSubstring(decoded, f * FrameStride, FrameLen)

  private[llm] def resizeOf(decoded: String): String = {
    val head = cpSubstring(decoded, 0, ResizeSpan)
    val sb = new java.lang.StringBuilder
    var i = 0
    var cp = 0
    while (i < head.length) {
      val c = head.codePointAt(i)
      if (cp % ResizeStep == 0) sb.appendCodePoint(c)
      i += Character.charCount(c)
      cp += 1
    }
    sb.toString
  }

  def sampleFrames(payloads: Dataset[Payload])(implicit spark: SparkSession): Dataset[Frames] = {
    import spark.implicits._
    payloads.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5") // per-partition decoder handle
      def hex(s: String): String = {
        md.reset()
        md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString
      }
      it.map { p =>
        val decoded = new String(p.bin, java.nio.charset.StandardCharsets.UTF_8)
        val nCp = decoded.codePointCount(0, decoded.length)
        val n = math.min(MaxFrames, 1 + nCp / FrameStride)
        val frames = (0 until n).map(f => hex(frameOf(decoded, f)))
        Frames(p.doc_id, n, frames.mkString(";"), hex(resizeOf(decoded)))
      }
    }
  }

  def frames(docs: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    sampleFrames(payloads(docs).as[Payload])(spark).toDF()
  }

  // ---- perceptual-hash near-dup ----------------------------------------

  /** Chunk window width (code points) for the perceptual hash. */
  val ChunkLen = 8
  /** Hamming bands over the 32-bit phash: 4 bands × 8 bits. */
  val PhashBands = 4

  /** 32-bit perceptual hash of the decoded payload: simhash over its
    * fixed-width chunk windows (the binary analog of word-token simhash —
    * a few flipped chunks flip few hash bits). Chunks are code-point
    * windows of the decoded content, like [[frameOf]], so the DuckDB
    * oracle recomputes identical windows via substr. Scale shape: chunk
    * explode + one portable hash per chunk + 32 codegen'd conditional
    * sums per doc (`TextAnalysis.simhash32FromHashes`), map-side partials.
    */
  def phash32(docs: DataFrame): DataFrame = {
    val chunks = docs
      .select(col("doc_id"), explode_outer(expr(
        s"""CASE WHEN length(text) = 0 THEN array()
           |ELSE transform(sequence(0, cast((length(text) + ${ChunkLen - 1}) div $ChunkLen as int) - 1),
           |               f -> substring(text, f * $ChunkLen + 1, $ChunkLen)) END""".stripMargin))
        .as("c"))
      .select(col("doc_id"), graft.expr.PortableHash.phash(col("c")).as("h"))
    TextAnalysis.simhash32FromHashes(chunks, "doc_id")
      .withColumnRenamed("simhash", "ph")
  }

  /** Near-duplicate payload pairs: phash bands (8-bit bytes) bucket the
    * candidates — with 4 bands, two payloads within `maxHamming` < 4 bit
    * flips MUST share an intact band (pigeonhole: missing every band
    * needs ≥ 4 flips — the classic simhash block scheme) — then the exact
    * Hamming distance verifies. Same bucketed-candidates-then-verify
    * contract as the MinHash chain, including the occupancy cap
    * (`Dedup.cappedBuckets`): a band byte shared by millions of exact-dup
    * payloads is exact-dedup's job, not a quadratic bucket here.
    */
  def nearDupPayloads(docs: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming < PhashBands,
      s"$PhashBands bands guarantee recall only below $PhashBands flips")
    val p = phash32(docs).localCheckpoint() // both self-join sides read it
    val banded = Dedup.cappedBuckets(
      p.select(col("doc_id"), col("ph"),
          explode(sequence(lit(0), lit(PhashBands - 1))).as("band"))
        .withColumn("bh", expr("shiftright(ph, band * 8) & 255")),
      Dedup.MaxBandBucket)
    banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"),
        col("l.ph").as("pa"), col("r.ph").as("pb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(pa ^ pb)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
  }

  /** DuckDB mirror of [[nearDupPayloads]] over a `documents` table. */
  def sqlNearDupPayloads(maxHamming: Int): String = {
    val chunks = s"[substr(text, f * $ChunkLen + 1, $ChunkLen) " +
      s"for f in range(0, (length(text) + ${ChunkLen - 1}) // $ChunkLen)]"
    s"""WITH t AS (SELECT doc_id, $chunks AS cs FROM documents),
       |p AS (SELECT doc_id, ${TextAnalysis.sqlSimhash32("cs")} AS ph FROM t),
       |b0 AS (SELECT doc_id, ph, band, (ph >> (band * 8)) & 255 AS bh
       |       FROM p CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band)),
       |b AS (SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY band, bh) AS occ
       |                     FROM b0) WHERE occ <= ${Dedup.MaxBandBucket}),
       |c AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b, l.ph AS pa, r.ph AS pb
       |      FROM b l JOIN b r ON l.band = r.band AND l.bh = r.bh
       |        AND l.doc_id < r.doc_id)
       |SELECT a, b, bit_count(xor(pa, pb))::BIGINT AS hamming FROM c
       |WHERE bit_count(xor(pa, pb)) <= $maxHamming""".stripMargin
  }
}
