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
  * Blob encoding: two codecs over the same tile rows. The deterministic
  * length-prefixed big-endian layout ([[encodeTiles]]) is the
  * oracle-checkable twin; [[encodeTilesMvt]] emits real Mapbox Vector Tile
  * bytes through the hand-rolled [[Mvt]] writer (the wire format the
  * reference produces via `no.ecc.vectortile`, `VectorTiles.java:39-85`).
  * The pipeline writes both side by side.
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
      (r.getString(0), encodeTileValue(r.getSeq[Row](1)))
    }
  }

  /** The custom-codec body shared by [[encodeTiles]] and
    * [[encodeTilesWithMvt]] — one implementation, no drift.
    */
  private def encodeTileValue(pixels: Seq[Row]): Array[Byte] = {
    val nBytes = 4 + pixels.map(p => 12 + p.getSeq[Row](2).length * 12).sum
    val bb = ByteBuffer.allocate(nBytes)
    bb.putInt(pixels.length)
    pixels.foreach { p =>
      bb.putInt(p.getInt(0)); bb.putInt(p.getInt(1))
      val feats = p.getSeq[Row](2)
      bb.putInt(feats.length)
      feats.foreach { f => bb.putInt(f.getInt(0)); bb.putLong(f.getLong(1)) }
    }
    bb.array()
  }

  /** Restructure one tile's pixel rows into MVT layers, mirroring
    * `VectorTiles.java:55-82`: per pixel, features regroup as
    * bor → (year → count); each (pixel, bor) becomes one point feature in
    * the layer named by the bor string, attribute key = year as string
    * (`"null"` when absent, `String.valueOf` semantics, `:76`). Unlike the
    * reference's `HashMap.keySet` iteration, order is insertion-deterministic
    * end to end.
    */
  private def mvtLayers(pixels: Seq[Row], codes: Map[Int, String])
      : Seq[(String, Seq[Mvt.PointFeature])] = {
    val layers = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[Mvt.PointFeature]]
    pixels.foreach { p =>
      val x = p.getInt(0); val y = p.getInt(1)
      val perBor = scala.collection.mutable.LinkedHashMap
        .empty[String, scala.collection.mutable.ArrayBuffer[(String, Long)]]
      p.getSeq[Row](2).foreach { f =>
        val enc = f.getInt(0); val count = f.getLong(1)
        val bor = codes.getOrElse(enc % 100, "UNKNOWN")
        val year = enc / 100
        perBor.getOrElseUpdate(bor, scala.collection.mutable.ArrayBuffer.empty) +=
          ((if (year > 0) year.toString else "null") -> count)
      }
      perBor.foreach { case (bor, attrs) =>
        layers.getOrElseUpdate(bor, scala.collection.mutable.ArrayBuffer.empty) +=
          Mvt.PointFeature(x, y, attrs.toSeq)
      }
    }
    layers.iterator.map { case (n, fs) => (n, fs.toSeq) }.toSeq
  }

  /** Real MVT wire-format tile blobs over the same (key, tile) contract as
    * [[encodeTiles]]. `extent` is the tile size (the reference passes its
    * tileSize as the encoder extent, `VectorTiles.java:40`).
    */
  def encodeTilesMvt(tiles: DataFrame, extent: Int,
                     codes: Seq[(String, Int)] = graft.expr.BorYear.EventTypeCodes)
      (implicit spark: SparkSession): Dataset[(String, Array[Byte])] = {
    import spark.implicits._
    val codeMap = codes.map(_.swap).toMap
    tiles.select(col("key"), col("tile")).map { r =>
      (r.getString(0), Mvt.encode(mvtLayers(r.getSeq[Row](1), codeMap), extent))
    }
  }

  /** One pass, both codecs: (key, custom value, mvt bytes) — what the
    * pipeline writes, so wire-format consumers and the oracle-checkable
    * codec share a single encode scan.
    */
  def encodeTilesWithMvt(tiles: DataFrame, extent: Int,
                         codes: Seq[(String, Int)] = graft.expr.BorYear.EventTypeCodes)
      (implicit spark: SparkSession): Dataset[(String, Array[Byte], Array[Byte])] = {
    import spark.implicits._
    val codeMap = codes.map(_.swap).toMap
    tiles.select(col("key"), col("tile")).map { r =>
      val pixels = r.getSeq[Row](1)
      (r.getString(0), encodeTileValue(pixels),
        Mvt.encode(mvtLayers(pixels, codeMap), extent))
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
      (r.getString(0), encodePointValue(r.getSeq[Row](1)))
    }
  }

  /** The custom-codec body shared by [[encodePoints]] and
    * [[encodePointsWithPb]] — one implementation, no drift.
    */
  private def encodePointValue(feats: Seq[Row]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + feats.length * 28)
    bb.putInt(feats.length)
    feats.foreach { f =>
      bb.putDouble(f.getDouble(0)); bb.putDouble(f.getDouble(1))
      bb.putInt(f.getInt(2)); bb.putLong(f.getLong(3))
    }
    bb.array()
  }

  /** One pass, both codecs: (key, custom value, protobuf wire bytes) — the
    * point-path mirror of [[encodeTilesWithMvt]]. `pb` is the
    * `PointFeatures` message the reference ships to HBase
    * (`ProtobufTiles.java:31-51`, via [[PointPb]]), with borYear unpacked to
    * the enum + year fields exactly as `EncodeBorYearUDF.bor/year` does.
    */
  def encodePointsWithPb(points: DataFrame)
      (implicit spark: SparkSession): Dataset[(String, Array[Byte], Array[Byte])] = {
    import spark.implicits._
    points.select(col("key"), col("features")).map { r =>
      val feats = r.getSeq[Row](1)
      val pb = PointPb.encode(feats.map { f =>
        val borYear = f.getInt(2)
        PointPb.Feature(f.getDouble(0), f.getDouble(1),
          bor = borYear % 100, year = borYear / 100, count = f.getLong(3))
      })
      (r.getString(0), encodePointValue(feats), pb)
    }
  }
}
