package graft.tiles

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expr.{BorYear, Salt}

/** The tile-pyramid aggregation cascade (reference: `TileMapBuilder.java`).
  *
  * Stages (all hash aggregations; Spark supplies partial/final phases):
  *   - prepareInput (`:80-106`): explode map views + pre-aggregate counts per
  *     (mapKey, lat, lng, borYear) — collapses the raw scan once, before the
  *     4-projection × 17-zoom fan-out re-reads it.
  *   - t1 (`:113-127`): project to global pixel, sum counts per pixel.
  *   - t2 (`:130-136`): collect per-pixel features.
  *   - t3 (`:139-156`): explode buffered tile addresses, collect per tile
  *     under a salted key.
  *
  * Determinism: every `collect_list` is wrapped in `array_sort` (the
  * reference's lists are order-nondeterministic; sorted arrays make results
  * oracle-checkable and reproducible across cluster sizes).
  *
  * Scale notes (100 TB posture): prepareInput's output should be
  * checkpointed (parquet) by the caller before the per-zoom loop — see
  * [[graft.SparkEntry]]'s pipeline — exactly as the reference materializes
  * its CTAS table (`MapBuilder.java:130-133`). The t3 `collect_list` is an
  * `ObjectHashAggregate`; group cardinality at zoom z is bounded by the tile
  * count × map views, and each group's payload is one tile's pixels
  * (≤ (tileSize+2·buffer)²), which bounds executor memory independent of
  * input rows.
  */
object Pyramid {

  /** Deepest zoom the reference's int-typed tile schema supports
    * (`TileXYUDF.java:65-69`). Above this the cascade transparently switches
    * to the exact-BIGINT pixel + address path (`Projections.globalPixelLong`,
    * `TileAddressing.addressesLong`) — same wrap/buffer semantics, proven
    * equal at shared zooms by `TileAddressSpec`, so a z17+ build is the same
    * pipeline with wider tile coordinates, not a separate code path.
    */
  val IntZoomCap: Int = 16

  /** Explode map views and pre-aggregate: one row per
    * (mapKey, lat, lng, borYear) with its occurrence count.
    * Reference: `TileMapBuilder.java:86-104` (and `MapBuilder.java:182-197`
    * for the stats variant).
    *
    * `occ` is an occurrence-shaped frame with columns
    * `lat, lng, basisOfRecord, year` + the id columns consumed by
    * `mapKeysArray` (a ready-built `array<string>` column expression).
    */
  def prepareInput(
      occ: DataFrame,
      mapKeysArray: org.apache.spark.sql.Column,
      borCodes: Seq[(String, Int)] = BorYear.EventTypeCodes): DataFrame =
    occ
      .select(
        explode(mapKeysArray).as("mapKey"),
        col("lat"), col("lng"),
        BorYear.encode(col("basisOfRecord"), col("year"), borCodes).as("borYear"))
      .groupBy("mapKey", "lat", "lng", "borYear")
      .agg(count(lit(1)).as("occCount"))

  /** t1: global-pixel projection + per-pixel sum (`TileMapBuilder.java:113-127`).
    *
    * Shuffle note: an explicit pre-partition on (mapKey, xy) would let t1
    * and t2 share one exchange, but it was measured SLOWER (6.3 s vs 5.2 s
    * at sf0.1): it shuffles raw rows, defeating t1's map-side partial
    * aggregation, which collapses duplicates before the exchange — the
    * property that matters most at 100 TB. Keep Catalyst's default plan.
    */
  def pixelCounts(input: DataFrame, proj: Projection, zoom: Int, tileSize: Int): DataFrame =
    pixelCountsPath(input, proj, zoom, tileSize, useLong = zoom > IntZoomCap)

  private[graft] def pixelCountsPath(input: DataFrame, proj: Projection, zoom: Int,
      tileSize: Int, useLong: Boolean): DataFrame =
    input
      .select(
        col("mapKey"),
        (if (!useLong) proj.globalPixel(col("lat"), col("lng"), zoom, tileSize)
         else proj.globalPixelLong(col("lat"), col("lng"), zoom, tileSize)).as("xy"),
        col("borYear"), col("occCount"))
      .groupBy("mapKey", "xy", "borYear")
      .agg(sum("occCount").as("occCount"))
      .select(
        col("mapKey"), col("xy"),
        struct(col("borYear"), col("occCount")).as("borYearCount"))

  /** t2: collect per-pixel features (`TileMapBuilder.java:130-136`). */
  def pixelFeatures(t1: DataFrame): DataFrame =
    t1.filter(col("xy").isNotNull)
      .groupBy("mapKey", "xy")
      .agg(array_sort(collect_list(col("borYearCount"))).as("features"))

  /** t3: re-address pixels onto buffered tiles and collect one row per
    * salted tile key (`TileMapBuilder.java:139-156`).
    */
  def tiles(t2: DataFrame, addressing: TileAddressing, zoom: Int, saltModulo: Int): DataFrame =
    tilesPath(t2, addressing, zoom, saltModulo, useLong = zoom > IntZoomCap)

  private[graft] def tilesPath(t2: DataFrame, addressing: TileAddressing, zoom: Int,
      saltModulo: Int, useLong: Boolean): DataFrame =
    t2.select(
        col("mapKey"),
        explode(
          if (!useLong) addressing.addresses(zoom, col("xy.x"), col("xy.y"))
          else addressing.addressesLong(zoom, col("xy.x"), col("xy.y"))).as("tile"),
        col("features"))
      .select(
        Salt.tileKey(col("mapKey"), lit(zoom), col("tile.tileX"), col("tile.tileY"), saltModulo)
          .as("key"),
        // local pixel coords live in [-buffer, tileSize+buffer) at EVERY
        // zoom — only tile ids outgrow Int past z16 — so the blob codecs
        // keep one int-typed pixel schema across both address paths
        struct(
          col("tile.pixelX").cast("int").as("x"),
          col("tile.pixelY").cast("int").as("y"),
          col("features")).as("pixel"))
      .groupBy("key")
      .agg(array_sort(collect_list(col("pixel"))).as("tile"))

  /** Full cascade for one projection × zoom. */
  def build(
      input: DataFrame,
      proj: Projection,
      zoom: Int,
      tileSize: Int,
      bufferSize: Int,
      saltModulo: Int): DataFrame = {
    val t1 = pixelCounts(input, proj, zoom, tileSize)
    val t2 = pixelFeatures(t1)
    tiles(t2, TileAddressing(proj, tileSize, bufferSize), zoom, saltModulo)
  }

  /** Test seam: the full cascade FORCED down the exact-BIGINT path at any
    * zoom, so specs can pin pipeline-OUTPUT parity (salted keys, sorted
    * collected tiles — not just per-address equality) between the int and
    * long paths at a shared zoom ≤ [[IntZoomCap]]. Production callers use
    * [[build]], which switches automatically at the cap.
    */
  private[graft] def buildLongPath(
      input: DataFrame,
      proj: Projection,
      zoom: Int,
      tileSize: Int,
      bufferSize: Int,
      saltModulo: Int): DataFrame = {
    val t1 = pixelCountsPath(input, proj, zoom, tileSize, useLong = true)
    val t2 = pixelFeatures(t1)
    tilesPath(t2, TileAddressing(proj, tileSize, bufferSize), zoom, saltModulo, useLong = true)
  }
}
