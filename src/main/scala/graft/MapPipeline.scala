package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.BorYear
import graft.io.Sinks
import graft.points.PointMap
import graft.tiles.{Projections, Pyramid, TileAddressing}

/** The complete map-build pipeline — the engine's analog of the reference's
  * `MapBuilder.run()` → `PointMapBuilder` / `TileMapBuilder` flow:
  *
  *  1. Explode map views + pre-aggregate, then MATERIALIZE as parquet — the
  *     reference's CTAS barrier against lazy re-reads across the
  *     4-projection × (maxZoom+1) fan-out (`MapBuilder.java:130-133,171-173`,
  *     `TileMapBuilder.java:84-104`).
  *  2. Split views by cardinality: ≥ threshold → tile pyramid, else point
  *     blobs. The reference collects the big-view set to the driver and
  *     ships it in UDF closures (`MapBuilder.java:180-206`) — the one part
  *     of its design that cannot scale; we use broadcast semi/anti joins.
  *  3. Point path: per-view feature blobs under salted keys
  *     (`PointMapBuilder.java:49-93`).
  *  4. Tile path: per projection × zoom (slowest-first), the t1→t3 cascade,
  *     deterministic blob encode, salt-partitioned sorted sink
  *     (`TileMapBuilder.java:51-77,113-200`). EPSG:3031 runs on a
  *     south-hemisphere pre-filter (`TileMapBuilder.java:59-62`).
  */
object MapPipeline {

  /** Materialization barrier between pipeline stages — the reference models
    * these as Hive CTAS checkpoint tables (`TileMapBuilder.java:85-104`,
    * `use <db>` at `MapBuilder.java:171-173`). Both modes cut lineage the
    * same way: write once, give downstream stages a fresh scan.
    */
  sealed trait Barrier extends Serializable {
    def materialize(spark: SparkSession, df: DataFrame, name: String): DataFrame
  }

  /** Parquet-path barrier: files under `workDir` (round-1 behavior). */
  case class PathBarrier(workDir: String) extends Barrier {
    def materialize(spark: SparkSession, df: DataFrame, name: String): DataFrame = {
      val p = s"$workDir/$name"
      df.write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }
  }

  /** Namespacing wrapper: routes every `materialize` through `inner` under
    * `<prefix>_<name>`. A repeated stage sequence (e.g. one `admitDelta`
    * per arriving micro-batch, which always materializes `delta_url` /
    * `delta_clean` / …) would otherwise OVERWRITE its previous batch's
    * tables — and a frame read from the old path would silently serve the
    * new batch's rows on its next (lazy) scan.
    */
  case class PrefixedBarrier(inner: Barrier, prefix: String) extends Barrier {
    def materialize(spark: SparkSession, df: DataFrame, name: String): DataFrame =
      inner.materialize(spark, df, s"${prefix}_$name")
  }

  /** Session-catalog barrier: real `CREATE TABLE … USING parquet AS SELECT`
    * into database `db` — the reference's S5/S6 CTAS semantics. The sandbox
    * has no Hive metastore (SURVEY §7.5); the in-memory catalog exercises
    * the identical SQL surface, so a Hive-enabled session drops in.
    */
  case class CatalogBarrier(db: String = "graft",
                            partitionBy: Seq[String] = Nil) extends Barrier {
    def materialize(spark: SparkSession, df: DataFrame, name: String): DataFrame = {
      spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
      val view = s"__ctas_${db}_$name"
      df.createOrReplaceTempView(view)
      spark.sql(s"DROP TABLE IF EXISTS $db.$name")
      // a real Hive deployment partitions the pyramid checkpoint tables
      // (e.g. by zoom) so downstream zoom-sliced reads prune at the
      // metastore level — same CTAS surface, one clause
      val part =
        if (partitionBy.isEmpty) "" else partitionBy.mkString(" PARTITIONED BY (", ", ", ")")
      spark.sql(s"CREATE TABLE $db.$name USING parquet$part AS SELECT * FROM $view")
      spark.catalog.dropTempView(view)
      spark.table(s"$db.$name")
    }
  }

  case class Config(
      workDir: String,
      tileSize: Int = 512,
      bufferSize: Int = 64,
      maxZoom: Int = 16,
      saltModulo: Int = 10,
      threshold: Long = 250000,
      projections: Seq[String] = Seq("EPSG:3857", "EPSG:4326", "EPSG:3575", "EPSG:3031"),
      borCodes: Seq[(String, Int)] = BorYear.EventTypeCodes,
      barrier: Option[Barrier] = None,
      // per-stage wall-clock hook (BenchPipeline); stages run eagerly
      // (barrier writes, sink writes), so each callback is a real wall time
      onStage: (String, Double) => Unit = (_, _) => ()) {
    def effectiveBarrier: Barrier = barrier.getOrElse(PathBarrier(workDir))
  }

  private def timed[T](cfg: Config)(name: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    cfg.onStage(name, (System.nanoTime() - t0) / 1e9)
    r
  }

  /** `prepared` / `tileInput` are the post-barrier handles (parquet scan or
    * catalog table scan depending on `Config.barrier`).
    */
  case class Result(prepared: DataFrame, tileInput: DataFrame,
                    pointsPath: String, tileDirs: Seq[String])

  def run(spark: SparkSession, occ: DataFrame, mapKeysArray: Column, cfg: Config): Result = {
    val barrier = cfg.effectiveBarrier
    // -- 1. prepare + materialization barrier
    val prepared = timed(cfg)("prepare_barrier") {
      barrier.materialize(spark,
        Pyramid.prepareInput(occ, mapKeysArray, cfg.borCodes), "prepared")
    }

    // -- 2. cardinality split (broadcast semi/anti join, not driver collect)
    val bigViews = prepared.groupBy("mapKey")
      .agg(sum("occCount").as("n")).filter(col("n") >= cfg.threshold)
      .select("mapKey")
    val tileInput = timed(cfg)("tile_input_barrier") {
      barrier.materialize(spark,
        prepared.join(broadcast(bigViews), Seq("mapKey"), "left_semi"), "tile_input")
    }
    val pointInput = prepared.join(broadcast(bigViews), Seq("mapKey"), "left_anti")

    // -- 3. point path
    implicit val s: SparkSession = spark
    val pointsPath = s"${cfg.workDir}/points"
    timed(cfg)("points_sink") {
      // both codecs in one encode scan, mirroring the tile sink: `value` =
      // the oracle-checkable layout, `pb` = the protobuf wire bytes the
      // reference bulk-loads (`PointMapBuilder.java:84-92`)
      Sinks.writeSorted(
        Sinks.encodePointsWithPb(PointMap.pointFeatures(pointInput, cfg.saltModulo))
          .toDF("key", "value", "pb"),
        cfg.saltModulo, pointsPath)
    }

    // -- 4. tile path: projections × zooms, slowest (deepest) first
    val needsSouth = cfg.projections.contains("EPSG:3031")
    val south = // 100 km buffer ≈ lat <= 1 (TileMapBuilder.java:59-62)
      if (needsSouth) timed(cfg)("south_barrier") {
        barrier.materialize(spark,
          tileInput.filter(col("lat") <= 1), "tile_input_south")
      }
      else tileInput

    val tileDirs = for {
      epsg <- cfg.projections
      zoom <- (cfg.maxZoom to 0 by -1)
    } yield {
      val proj = Projections.fromEpsg(epsg)
      val input = if (epsg == "EPSG:3031") south else tileInput
      val dir = s"${cfg.workDir}/tiles/${epsg.replaceAll(":", "_")}/z$zoom"
      timed(cfg)(s"tiles/${epsg.replaceAll(":", "_")}/z$zoom") {
        val t3 = Pyramid.build(input, proj, zoom, cfg.tileSize, cfg.bufferSize, cfg.saltModulo)
        // both codecs in one encode scan: `value` = the oracle-checkable
        // deterministic layout, `mvt` = real Mapbox Vector Tile wire bytes
        Sinks.writeSorted(
          Sinks.encodeTilesWithMvt(t3, cfg.tileSize, cfg.borCodes)
            .toDF("key", "value", "mvt"),
          cfg.saltModulo, dir)
      }
      dir
    }
    Result(prepared, tileInput, pointsPath, tileDirs)
  }
}
