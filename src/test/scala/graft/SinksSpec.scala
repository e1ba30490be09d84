package graft

import graft.io.Sinks

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("sortedBySalt: partition index == salt, keys sorted within partitions") {
    val modulo = 10
    // keys across all salts, deliberately shuffled
    val keys = (0 until 500).map(i => s"${i % modulo}:view:$i").reverse
    val df = keys.toDF("key").withColumn("value", org.apache.spark.sql.functions.lit(Array[Byte](1)))
    val parts = Sinks.sortedBySalt(df, modulo).rdd
      .mapPartitionsWithIndex { (idx, it) =>
        val ks = it.map(_.getString(0)).toVector
        Iterator.single((idx, ks))
      }.collect().toMap
    assert(parts.size == modulo)
    parts.foreach { case (idx, ks) =>
      assert(ks.nonEmpty, s"partition $idx non-empty")
      assert(ks.forall(_.startsWith(s"$idx:")), s"partition $idx holds only salt $idx")
      assert(ks == ks.sorted, s"partition $idx sorted")
    }
  }

  test("MVT golden bytes: a known tile encodes to the hand-computed wire format") {
    // One layer "view", one point feature at (1, 2) with attrs {"2024": 5},
    // extent 512. Every byte derived by hand from the public MVT 2.1 proto:
    //   tile:  1A 22                    Tile.layers (field 3, len 0x22)
    //   layer: 78 02                    version = 2 (field 15)
    //          0A 04 76 69 65 77        name = "view"
    //          12 0B                    Feature (field 2, len 11)
    //            12 02 00 00            tags = [0, 0] (packed)
    //            18 01                  type = POINT
    //            22 03 09 02 04         geometry = [MoveTo, zz(1), zz(2)]
    //          1A 04 32 30 32 34        keys = ["2024"]
    //          22 02 20 05              values = [{int_value: 5}]
    //          28 80 04                 extent = 512
    val expected = Array(
      0x1A, 0x22, 0x78, 0x02, 0x0A, 0x04, 0x76, 0x69, 0x65, 0x77,
      0x12, 0x0B, 0x12, 0x02, 0x00, 0x00, 0x18, 0x01, 0x22, 0x03,
      0x09, 0x02, 0x04, 0x1A, 0x04, 0x32, 0x30, 0x32, 0x34, 0x22,
      0x02, 0x20, 0x05, 0x28, 0x80, 0x04).map(_.toByte)
    val got = graft.io.Mvt.encode(
      Seq("view" -> Seq(graft.io.Mvt.PointFeature(1, 2, Seq("2024" -> 5L)))), 512)
    assert(got.toSeq == expected.toSeq,
      s"got ${got.map("%02X".format(_)).mkString(" ")}")
  }

  test("MVT codec round-trips: multi-layer, buffer coords, shared keys/values") {
    import graft.io.Mvt
    val layers = Seq(
      "view" -> Seq(
        Mvt.PointFeature(-10, 515, Seq("2023" -> 3L, "2024" -> 5L)), // buffer pixel
        Mvt.PointFeature(0, 0, Seq("2024" -> 5L, "null" -> 12345678901L))), // dedup + big count
      "click" -> Seq(Mvt.PointFeature(511, 511, Seq("null" -> 1L))))
    val decoded = Mvt.decode(Mvt.encode(layers, 512))
    assert(decoded.map(_.extent) == Seq(512, 512))
    assert(decoded.map(l => l.name -> l.features) == layers)
  }

  test("property: MVT codec round-trips arbitrary layer/feature/attr structures") {
    import graft.io.Mvt
    import org.scalacheck.Gen
    val attr = for {
      k <- Gen.oneOf(Gen.choose(1500, 2026).map(_.toString), Gen.const("null"))
      v <- Gen.oneOf(Gen.choose(0L, 1000L), Gen.choose(0L, Long.MaxValue))
    } yield (k, v)
    val feature = for {
      x <- Gen.choose(-128, 640) // incl. buffer coords outside [0, extent)
      y <- Gen.choose(-128, 640)
      attrs <- Gen.listOfN(3, attr).map(_.distinctBy(_._1))
    } yield Mvt.PointFeature(x, y, attrs)
    val layer = for {
      name <- Gen.oneOf("view", "click", "purchase", "signup", "error")
      feats <- Gen.nonEmptyListOf(feature).map(_.take(20))
    } yield (name, feats)
    val tileGen = Gen.listOfN(4, layer).map(_.distinctBy(_._1))
    for (seed <- 0 until 50) {
      val layers = tileGen(Gen.Parameters.default, org.scalacheck.rng.Seed(9000L + seed))
        .getOrElse(sys.error("generator exhausted"))
      val decoded = Mvt.decode(Mvt.encode(layers, 512))
      assert(decoded.map(l => (l.name, l.features)) == layers &&
        decoded.forall(_.extent == 512), s"seed $seed round-trip")
    }
  }

  test("encodeTilesWithMvt: both codecs from one scan; MVT layers follow VectorTiles semantics") {
    implicit val s = spark
    // borYear: 202403 = (2024, "view"), 202401 = (2024, "click"),
    // 3 = (null year, "view") — VectorTiles.java:59-78 regroups per pixel as
    // bor -> {year -> count}, one point feature per (pixel, bor)
    val tiles = Seq(
      ("0:view:z0:0:0", Seq((1, 2, Seq((202403, 5L), (202401, 2L), (3, 7L)))))
    ).toDF("key", "tile")
    val out = Sinks.encodeTilesWithMvt(tiles, extent = 512).collect()
    assert(out.length == 1)
    val (key, value, mvt) = out.head
    assert(key == "0:view:z0:0:0")
    // custom codec identical to the single-codec path
    assert(Sinks.decodeTile(value) ==
      Seq((1, 2, Seq((202403, 5L), (202401, 2L), (3, 7L)))))
    // wire format carries the restructured layers
    val layers = graft.io.Mvt.decode(mvt)
    assert(layers.map(_.name) == Seq("view", "click"))
    val view = layers.find(_.name == "view").get
    assert(view.extent == 512)
    assert(view.features ==
      Seq(graft.io.Mvt.PointFeature(1, 2, Seq("2024" -> 5L, "null" -> 7L))))
    assert(layers.find(_.name == "click").get.features ==
      Seq(graft.io.Mvt.PointFeature(1, 2, Seq("2024" -> 2L))))
  }

  test("tile/point blob codecs are inverses") {
    val tile = Seq((1, 2, Seq((202400, 5L), (202401, 1L))), (-3, 515, Seq((7, 1L))))
    val bb = java.nio.ByteBuffer.allocate(4 + tile.map(p => 12 + p._3.length * 12).sum)
    bb.putInt(tile.length)
    tile.foreach { case (x, y, fs) =>
      bb.putInt(x); bb.putInt(y); bb.putInt(fs.length)
      fs.foreach { case (b, c) => bb.putInt(b); bb.putLong(c) }
    }
    assert(Sinks.decodeTile(bb.array()) == tile)
  }
}
