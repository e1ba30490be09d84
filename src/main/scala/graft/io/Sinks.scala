package graft.io

import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Sorted key→binary sinks and deterministic blob encoders.
  *
  * The reference's terminal stage shuffles by the key's salt prefix, sorts
  * within partitions and writes HBase HFiles
  * (`TileMapBuilder.java:181-200`, `SaltPrefixPartitioner.java:21-37`,
  * `PointMapBuilder.java:96-116`). HBase/HFile is cluster orchestration, not
  * query semantics (SURVEY §7.5): the engine models it as a generic sorted
  * key-value parquet sink with identical partitioning guarantees — one
  * partition per salt, keys sorted within each partition, so a bulk-loader
  * (or any range-partitioned store) can consume partitions as sorted runs.
  *
  * Blob encoding (`VectorTiles.java:39-85`, `ProtobufTiles.java:31-51`)
  * is replaced by a deterministic length-prefixed big-endian layout —
  * MVT/protobuf byte-exactness is not oracle-checkable and the libs are
  * unavailable offline; what matters at the engine layer is a stable,
  * schema-documented binary contract.
  */
object Sinks {

  /** Partition index == salt (region alignment) with keys sorted within
    * each partition — the exact contract of the reference's
    * `SaltPrefixPartitioner` + `repartitionAndSortWithinPartitions`
    * (`SaltPrefixPartitioner.java:21-37`, `TileMapBuilder.java:184`).
    *
    * A DataFrame `repartition(n, saltCol)` would hash-scatter salts across
    * partitions (murmur3, with collisions), so a bulk-loader consuming
    * partition i as region i's sorted run would misroute keys; this is the
    * one place the engine drops to the RDD layer for a custom partitioner.
    * `df` must have a string `key` column whose prefix up to the first ':'
    * is the zero-padded salt in [0, saltModulo).
    */
  def sortedBySalt(df: DataFrame, saltModulo: Int): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema
    val keyIdx = schema.fieldIndex("key")
    // validates each key against the declared modulo: a run salted for a
    // DIFFERENT modulo must fail loudly here, not crash with an opaque
    // out-of-range partition id (wider salt) or silently straddle region
    // boundaries (narrower salt sorts between 2-char split points)
    val saltWidth = graft.expr.Salt.saltCharCount(saltModulo)
    val partitioner = new org.apache.spark.Partitioner {
      override def numPartitions: Int = saltModulo
      override def getPartition(key: Any): Int = {
        val k = key.asInstanceOf[String]
        val pfx = k.takeWhile(_ != ':')
        require(pfx.length == saltWidth && pfx.forall(_.isDigit),
          s"key '$k' is not salted for modulo $saltModulo " +
            s"(expected a $saltWidth-digit prefix)")
        val s = pfx.toInt
        require(s < saltModulo,
          s"key '$k' has salt $s >= modulo $saltModulo")
        s
      }
    }
    val rows = df.rdd
      .map(r => (r.getString(keyIdx), r))
      .repartitionAndSortWithinPartitions(partitioner)
      .map(_._2)
    spark.createDataFrame(rows, schema)
  }

  /** Write as the engine's HFile-analog: parquet of (key:string, value:binary),
    * salt-partitioned and key-sorted within partitions.
    */
  def writeSorted(df: DataFrame, saltModulo: Int, path: String): Unit =
    sortedBySalt(df, saltModulo).write.mode("overwrite").parquet(path)

  /** Deterministic tile-blob encoding (vector-tile analog, `VectorTiles.java:39-85`):
    * for each pixel (x, y) a feature list of (borYear, count), all big-endian:
    * `[nPixels:int][x:int y:int nFeat:int [borYear:int count:long]*]*`.
    * Input rows must carry sorted arrays (Pyramid.tiles guarantees it), so
    * the bytes are reproducible across runs and cluster sizes.
    *
    * PRODUCTION SEAM: to emit real Mapbox vector tiles, replace ONLY this
    * map body with an MVT encoder (e.g. no.ecc.vectortile.VectorTileEncoder,
    * the lib the reference uses) — the (key, pixels with feature arrays) →
    * (key, bytes) contract, the upstream sorted-array guarantee, and
    * [[writeSorted]]'s salt partitioning all stay as-is.
    */
  def encodeTiles(tiles: DataFrame)(implicit spark: SparkSession): Dataset[(String, Array[Byte])] = {
    import spark.implicits._
    tiles.select(col("key"), col("tile")).map { r =>
      val key = r.getString(0)
      val pixels = r.getSeq[Row](1)
      val nBytes = 4 + pixels.map(p => 12 + p.getSeq[Row](2).length * 12).sum
      val bb = ByteBuffer.allocate(nBytes)
      bb.putInt(pixels.length)
      pixels.foreach { p =>
        bb.putInt(p.getInt(0)); bb.putInt(p.getInt(1))
        val feats = p.getSeq[Row](2)
        bb.putInt(feats.length)
        feats.foreach { f => bb.putInt(f.getInt(0)); bb.putLong(f.getLong(1)) }
      }
      (key, bb.array())
    }
  }

  /** Inverse of [[encodeTiles]] (for tests / consumers). */
  def decodeTile(bytes: Array[Byte]): Seq[(Int, Int, Seq[(Int, Long)])] = {
    val bb = ByteBuffer.wrap(bytes)
    Seq.fill(bb.getInt()) {
      val x = bb.getInt(); val y = bb.getInt()
      val feats = Seq.fill(bb.getInt())((bb.getInt(), bb.getLong()))
      (x, y, feats)
    }
  }

  /** Inverse of [[encodePoints]]. */
  def decodePoints(bytes: Array[Byte]): Seq[(Double, Double, Int, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    Seq.fill(bb.getInt())((bb.getDouble(), bb.getDouble(), bb.getInt(), bb.getLong()))
  }

  /** Deterministic point-blob encoding (`ProtobufTiles.java:31-51` analog):
    * `[nFeat:int [lat:double lng:double borYear:int count:long]*]`.
    */
  def encodePoints(points: DataFrame)(implicit spark: SparkSession): Dataset[(String, Array[Byte])] = {
    import spark.implicits._
    points.select(col("key"), col("features")).map { r =>
      val key = r.getString(0)
      val feats = r.getSeq[Row](1)
      val bb = ByteBuffer.allocate(4 + feats.length * 28)
      bb.putInt(feats.length)
      feats.foreach { f =>
        bb.putDouble(f.getDouble(0)); bb.putDouble(f.getDouble(1))
        bb.putInt(f.getInt(2)); bb.putLong(f.getLong(3))
      }
      (key, bb.array())
    }
  }
}
