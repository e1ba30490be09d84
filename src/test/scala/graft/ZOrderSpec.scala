package graft

import org.apache.spark.sql.functions._
import graft.ops.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("Column interleave matches the reference bit-by-bit (random coords)") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(500)((rnd.nextInt(65536), rnd.nextInt(65536)))
    val got = rows.toDF("x", "y")
      .select(ZOrder.interleave(col("x"), col("y")).as("z"))
      .as[Long].collect()
    rows.zip(got).foreach { case ((x, y), z) =>
      assert(z == ZOrder.interleaveLocal(x, y), s"($x,$y)")
    }
  }

  test("interleave de-interleaves: even bits are x, odd bits are y") {
    val rnd = new scala.util.Random(17)
    (0 until 200).foreach { _ =>
      val (x, y) = (rnd.nextInt(65536), rnd.nextInt(65536))
      val z = ZOrder.interleaveLocal(x, y)
      var (rx, ry) = (0L, 0L)
      (0 until 16).foreach { i =>
        rx |= ((z >> (2 * i)) & 1L) << i
        ry |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(rx == x && ry == y, s"z=$z")
    }
  }

  test("quantize16 clamps to [0, 65535] at and beyond the domain edges") {
    val vals = Seq(-181.0, -180.0, 0.0, 179.9999, 180.0, 181.0).toDF("v")
      .select(ZOrder.quantize16(col("v"), -180, 180).as("q")).as[Long].collect()
    assert(vals.head == 0L && vals(1) == 0L, "lower edge and below clamp to 0")
    assert(vals(4) == 65535L && vals(5) == 65535L, "upper edge and above clamp to 65535")
    assert(vals.forall(q => q >= 0 && q <= 65535))
  }

  test("layout: sorted within partitions, key ranges disjoint across partitions") {
    val rnd = new scala.util.Random(19)
    val df = Seq.fill(2000)((rnd.nextInt(65536), rnd.nextInt(65536)))
      .toDF("x", "y")
      .select(ZOrder.interleave(col("x"), col("y")).as("z"))
    val parts = ZOrder.layout(df, "z", 8)
      .select(spark_partition_id().as("p"), col("z"))
      .as[(Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    parts.values.foreach(zs => assert(zs == zs.sorted, "within-partition sorted"))
    val ranges = parts.toSeq.sortBy(_._1).map { case (_, zs) => (zs.min, zs.max) }
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(hi <= lo, "cross-partition ranges ordered")
      case _ =>
    }
  }

  test("z-order locality: per-prefix bounding boxes are tight on both dims") {
    // points on a diagonal band: after z-grouping, each 12-bit prefix bucket
    // must bound qx and qy within its own 2^8-cell tile (the skipping win)
    val rnd = new scala.util.Random(23)
    val df = Seq.fill(3000)((rnd.nextInt(65536), rnd.nextInt(65536))).toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.interleave(col("x"), col("y")).as("z"))
    val stats = df.groupBy(shiftright(col("z"), 20).as("pfx"))
      .agg(min("x").as("mnx"), max("x").as("mxx"), min("y").as("mny"), max("y").as("mxy"))
      .as[(Long, Int, Int, Int, Int)].collect()
    // top 12 z bits = top 6 bits of each dim → each bucket spans ≤ 2^10 cells/dim
    stats.foreach { case (pfx, mnx, mxx, mny, mxy) =>
      assert(mxx - mnx < 1024 && mxy - mny < 1024, s"prefix $pfx box too wide")
    }
  }
}
