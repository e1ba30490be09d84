package graft

import org.apache.spark.sql.functions._
import graft.tiles._

class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  val tileSize = 512

  private def pixel(proj: Projection, zoom: Int, lat: Double, lng: Double): Option[(Int, Int)] = {
    val r = Seq((lat, lng)).toDF("lat", "lng")
      .select(proj.globalPixel(col("lat"), col("lng"), zoom, tileSize).as("xy"))
      .select("xy.x", "xy.y").collect().head
    if (r.isNullAt(0)) None else Some((r.getInt(0), r.getInt(1)))
  }

  test("EPSG:3857 fixed points (published Web Mercator)") {
    assert(pixel(Mercator3857, 0, 0.0, 0.0).contains((tileSize / 2, tileSize / 2)))
    assert(pixel(Mercator3857, 0, 0.0, -180.0).contains((0, tileSize / 2)))
    assert(pixel(Mercator3857, 1, 0.0, 0.0).contains((tileSize, tileSize)))
    // beyond the mercator clamp → null (GlobalPixelUDF.java:51-57 behavior)
    assert(pixel(Mercator3857, 0, 86.0, 0.0).isEmpty)
    assert(pixel(Mercator3857, 0, -86.0, 0.0).isEmpty)
  }

  test("EPSG:4326 2x1 world: poles plottable, equator at mid-height") {
    assert(pixel(PlateCarree4326, 0, 90.0, -180.0).contains((0, 0)))
    assert(pixel(PlateCarree4326, 0, 0.0, 0.0).contains((tileSize, tileSize / 2)))
    // x spans 2 tiles at zoom 0
    assert(pixel(PlateCarree4326, 0, 0.0, 179.999).exists(_._1 > 2 * tileSize - 3))
  }

  test("polar projections: pole at center, hemisphere domains") {
    assert(pixel(NorthPolarLaea3575, 0, 90.0, 0.0).contains((tileSize / 2, tileSize / 2)))
    assert(pixel(NorthPolarLaea3575, 0, -10.0, 0.0).isEmpty, "southern hemisphere unplottable in 3575")
    assert(pixel(SouthPolarStereo3031, 0, -90.0, 0.0).contains((tileSize / 2, tileSize / 2)))
    assert(pixel(SouthPolarStereo3031, 0, 10.0, 0.0).isEmpty, "northern hemisphere unplottable in 3031")
  }

  test("pixels stay in world bounds across zooms") {
    val pts = for (lat <- -85 to 85 by 17; lng <- -180 to 179 by 31) yield (lat.toDouble, lng.toDouble)
    val df = pts.toDF("lat", "lng")
    for (proj <- Projections.All; zoom <- Seq(0, 3, 8)) {
      val bad = df
        .select(proj.globalPixel(col("lat"), col("lng"), zoom, tileSize).as("xy"))
        .filter(col("xy").isNotNull)
        .filter(col("xy.x") < 0 || col("xy.x") >= proj.worldPxX(zoom, tileSize) ||
                col("xy.y") < 0 || col("xy.y") >= proj.worldPxY(zoom, tileSize))
        .count()
      assert(bad == 0, s"${proj.epsg} zoom $zoom out-of-bounds pixels")
    }
  }
}
