package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.analog.{OccurrenceAnalog => OA}
import graft.expr.BorYear
import graft.io.Sinks
import graft.tiles.{Projections, Pyramid}

/** End-to-end pipeline run at sf0.001 (mini pyramid: maxZoom 2), checking
  * the invariants the reference's HBase bulkload depends on: per-partition
  * key sorting, salt-aligned partitioning, decodable blobs, and conservation
  * of occurrence counts through the cascade.
  */
class PipelineSpec extends SparkSpec {

  test("full pipeline: points + 2-zoom pyramid, sorted salted sinks, decodable blobs") {
    val work = Files.createTempDirectory("graft_pipeline").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val occ = events.filter(OA.qualityFilter)
      .select(col("event_id"), col("user_id"), col("event_type"),
        OA.lat.as("lat"), OA.lng.as("lng"),
        col("event_type").as("basisOfRecord"), OA.yearCol.as("year"))

    val cfg = MapPipeline.Config(
      workDir = work, maxZoom = 2, saltModulo = 10, threshold = 500,
      projections = Seq("EPSG:3857", "EPSG:4326", "EPSG:3031"))
    val res = MapPipeline.run(spark, occ, OA.mapKeysArray, cfg)

    // 4-projection × zoom fan-out shape
    assert(res.tileDirs.size == 3 * 3, "3 projections x zooms 2..0")

    // conservation: prepared counts == filtered input rows × their views
    val prepared = res.prepared
    val totalOcc = prepared.agg(sum("occCount")).collect().head.getLong(0)
    val expected = events.filter(OA.qualityFilter)
      .select(explode(OA.mapKeysArray)).count()
    assert(totalOcc == expected, "pre-aggregation conserves exploded row count")

    // points: sorted within partitions, salt prefix matches partition count,
    // blobs decode to the per-view feature multiset
    val points = spark.read.parquet(res.pointsPath)
    val pointRows = points.collect()
    assert(pointRows.nonEmpty)
    pointRows.foreach { r =>
      val key = r.getString(0)
      val feats = Sinks.decodePoints(r.getAs[Array[Byte]](1))
      assert(key.matches("\\d:.*"), s"salted key format: $key")
      assert(feats.nonEmpty)
      // the wire-codec twin rides along and agrees feature-for-feature
      val pb = graft.io.PointPb.decode(r.getAs[Array[Byte]]("pb"))
      assert(pb == feats.map { case (lat, lng, borYear, count) =>
        graft.io.PointPb.Feature(lat, lng, borYear % 100, borYear / 100, count)
      }, s"pb twin mismatch for $key")
    }
    // per-partition sortedness of the sink (HFile contract)
    import spark.implicits._
    val unsorted = Sinks.sortedBySalt(points, 10)
      .mapPartitions { it =>
        val keys = it.map(_.getString(0)).toVector
        Iterator.single(keys == keys.sorted)
      }.collect()
    assert(unsorted.forall(identity), "keys sorted within every sink partition")

    // tiles at zoom 0 for 3857: world is one tile -> every key addresses tile (0,0);
    // decoded pixel sum over ALL views' tiles at z0 equals total occurrences of
    // tile-path views (each pixel lands on exactly 1 primary tile; buffered
    // duplicates excluded by filtering locals to [0, tileSize))
    val z0 = spark.read.parquet(res.tileDirs.find(_.contains("EPSG_3857/z0")).get)
    val decoded = z0.collect().map { r =>
      (r.getString(0), Sinks.decodeTile(r.getAs[Array[Byte]](1)))
    }
    assert(decoded.nonEmpty)
    decoded.foreach { case (key, _) =>
      assert(key.matches("\\d:(.*):0:0:0"), s"z0 key addresses tile (0,0): $key")
    }
    val tileViewTotal = decoded.flatMap(_._2)
      .filter { case (x, y, _) => x >= 0 && x < 512 && y >= 0 && y < 512 }
      .flatMap(_._3).map(_._2).sum
    val bigViews = res.tileInput
      .agg(sum("occCount")).collect().head.getLong(0)
    assert(tileViewTotal == bigViews, "z0 primary pixels conserve tile-path counts")

    // the sink carries BOTH codecs: the mvt column decodes as wire-format
    // vector tiles conserving the same per-tile counts as the custom codec
    val mvtIdx = z0.schema.fieldIndex("mvt")
    z0.collect().foreach { r =>
      val custom = Sinks.decodeTile(r.getAs[Array[Byte]]("value"))
      val layers = graft.io.Mvt.decode(r.getAs[Array[Byte]](mvtIdx))
      assert(layers.nonEmpty && layers.forall(_.extent == 512))
      val customTotal = custom.flatMap(_._3).map(_._2).sum
      val mvtTotal = layers.flatMap(_.features).flatMap(_.attrs).map(_._2).sum
      assert(mvtTotal == customTotal, s"mvt conserves counts for key ${r.getString(0)}")
    }
  }

  test("partitioned CTAS barrier: zoom-partitioned checkpoint prunes on re-read") {
    // the metastore shape a real Hive deployment uses for the pyramid
    // checkpoint tables: PARTITIONED BY (zoom), so zoom-sliced consumers
    // prune partitions instead of scanning the whole pyramid
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val occ = events.filter(OA.qualityFilter)
      .select(col("event_id"), col("user_id"), col("event_type"),
        OA.lat.as("lat"), OA.lng.as("lng"),
        col("event_type").as("basisOfRecord"), OA.yearCol.as("year"))
    val prepared = Pyramid.prepareInput(occ, OA.mapKeysArray, BorYear.EventTypeCodes)
    val proj = Projections.fromEpsg("EPSG:3857")
    val byZoom = (0 to 1).map { z =>
      Pyramid.build(prepared, proj, z, 512, 64, 10).withColumn("zoom", lit(z))
    }.reduce(_ unionByName _)

    val barrier = MapPipeline.CatalogBarrier(db = "graft_part", partitionBy = Seq("zoom"))
    val table = barrier.materialize(spark, byZoom, "pyramid")

    val parts = spark.sql("SHOW PARTITIONS graft_part.pyramid")
      .collect().map(_.getString(0)).sorted
    assert(parts.toSeq == Seq("zoom=0", "zoom=1"), s"one partition per zoom: ${parts.toSeq}")

    // a zoom-sliced read prunes at the partition level (no data filter,
    // no full-pyramid scan) and returns exactly that zoom's tiles
    val z1 = table.filter(col("zoom") === 1)
    val plan = z1.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("zoom"),
      s"zoom filter prunes partitions:\n$plan")
    val z1Expected = byZoom.filter(col("zoom") === 1).count()
    assert(z1.count() == z1Expected && z1Expected > 0)
    assert(table.count() == byZoom.count(), "full re-read preserves every tile row")

    spark.sql("DROP DATABASE graft_part CASCADE")
  }

  test("catalog CTAS barrier: checkpoints become real catalog tables, same pipeline output") {
    val work = Files.createTempDirectory("graft_pipeline_cat").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val occ = events.filter(OA.qualityFilter)
      .select(col("event_id"), col("user_id"), col("event_type"),
        OA.lat.as("lat"), OA.lng.as("lng"),
        col("event_type").as("basisOfRecord"), OA.yearCol.as("year"))

    val cfg = MapPipeline.Config(
      workDir = work, maxZoom = 1, saltModulo = 10, threshold = 500,
      projections = Seq("EPSG:3857"),
      barrier = Some(MapPipeline.CatalogBarrier(db = "graft_test")))
    val res = MapPipeline.run(spark, occ, OA.mapKeysArray, cfg)

    // the barriers are REAL catalog tables created via CTAS SQL
    val tables = spark.sql("SHOW TABLES IN graft_test").collect()
      .map(_.getAs[String]("tableName")).toSet
    assert(Set("prepared", "tile_input").subsetOf(tables),
      s"CTAS checkpoint tables registered: $tables")

    // identical conservation invariant through catalog-table scans
    val totalOcc = res.prepared.agg(sum("occCount")).collect().head.getLong(0)
    val expected = events.filter(OA.qualityFilter)
      .select(explode(OA.mapKeysArray)).count()
    assert(totalOcc == expected, "pre-aggregation conserves exploded row count")

    // catalog-mode result matches the path-mode result tile-for-tile
    assert(res.tileDirs.size == 2, "1 projection x zooms 1..0")
    val z0 = spark.read.parquet(res.tileDirs.find(_.contains("z0")).get)
    assert(z0.count() > 0, "tiles produced through catalog barriers")

    spark.sql("DROP DATABASE graft_test CASCADE")
  }

  test("deep zoom: BIGINT pixel cascade equals the int path at z8, builds at z17") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val occ = events.filter(OA.qualityFilter)
      .select(col("event_id"), col("user_id"), col("event_type"),
        OA.lat.as("lat"), OA.lng.as("lng"),
        col("event_type").as("basisOfRecord"), OA.yearCol.as("year"))
    val input = Pyramid.prepareInput(occ, OA.mapKeysArray, BorYear.EventTypeCodes)
      .localCheckpoint()
    val proj = Projections.fromEpsg("EPSG:3857")

    // replay the >IntZoomCap cascade at a SHARED zoom: long pixel source into
    // the same t2/t3 stages must reproduce the int path byte-for-byte
    // (addressesImpl already computes in BIGINT internally, so this isolates
    // globalPixelLong vs globalPixel)
    val intTiles = Pyramid.build(input, proj, 8, 512, 64, 10)
    val t1L = input
      .select(col("mapKey"),
        proj.globalPixelLong(col("lat"), col("lng"), 8, 512).as("xy"),
        col("borYear"), col("occCount"))
      .groupBy("mapKey", "xy", "borYear").agg(sum("occCount").as("occCount"))
      .select(col("mapKey"), col("xy"),
        struct(col("borYear"), col("occCount")).as("borYearCount"))
    val longTiles = Pyramid.tiles(Pyramid.pixelFeatures(t1L),
      graft.tiles.TileAddressing(proj, 512, 64), 8, 10)
    val intMap = intTiles.collect().map(r => r.getString(0) -> r.getSeq[Any](1)).toMap
    val longMap = longTiles.collect().map(r => r.getString(0) -> r.getSeq[Any](1)).toMap
    assert(intMap == longMap, "long-pixel cascade must equal the int path at z8")

    // above the cap the SAME build() call switches representation: tile ids
    // are exact at z17 (grid 2^17 per axis) and counts are conserved
    val z17 = Pyramid.build(input, proj, 17, 512, 64, 10)
    val rows = z17.collect()
    assert(rows.nonEmpty, "z17 pyramid builds through the LongType path")
    val n = 1L << 17
    val tileIds = rows.map { r =>
      val parts = r.getString(0).split(":")
      (parts(parts.length - 2).toLong, parts(parts.length - 1).toLong)
    }
    assert(tileIds.forall { case (x, y) => x >= 0 && x < n && y >= 0 && y < n },
      "z17 tile ids inside the 2^17 grid")
    // primary-pixel count conservation (buffered duplicates excluded)
    import org.apache.spark.sql.Row
    val z17Total = rows.map { r =>
      r.getSeq[Row](1)
        .filter(p => p.getInt(0) >= 0 && p.getInt(0) < 512 &&
                     p.getInt(1) >= 0 && p.getInt(1) < 512)
        .flatMap(_.getSeq[Row](2)).map(_.getLong(1)).sum
    }.sum
    val plottable = input
      .filter(proj.isPlottable(col("lat"), col("lng")))
      .agg(sum("occCount")).collect().head.getLong(0)
    assert(z17Total == plottable, s"z17 conserves plottable counts ($z17Total vs $plottable)")
  }
}
