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

  test("PointPb golden bytes: a known feature encodes to the hand-computed wire format") {
    import graft.io.PointPb
    // Feature{lat=10.5, lng=-20.25, bor=3, year=2024, count=5}; every byte
    // derived by hand from the proto3 wire spec:
    //   top:   0A 19                           features (field 1, len 25)
    //   feat:  09 <10.5 as le64>               latitude (field 1, fixed64)
    //          11 <-20.25 as le64>             longitude (field 2, fixed64)
    //          18 03                           basisOfRecord = 3
    //          20 E8 0F                        year = 2024 (varint)
    //          28 05                           count = 5
    val expected = Array(
      0x0A, 0x19,
      0x09, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x25, 0x40,
      0x11, 0x00, 0x00, 0x00, 0x00, 0x00, 0x40, 0x34, 0xC0,
      0x18, 0x03, 0x20, 0xE8, 0x0F, 0x28, 0x05).map(_.toByte)
    val got = PointPb.encode(Seq(PointPb.Feature(10.5, -20.25, 3, 2024, 5L)))
    assert(got.toSeq == expected.toSeq,
      s"got ${got.map("%02X".format(_)).mkString(" ")}")
  }

  test("PointPb proto3 default elision: zero-valued fields are omitted, decode restores them") {
    import graft.io.PointPb
    // bor=0 ("signup"), year absent (0), lat 0.0 — a proto3 serializer
    // writes none of these; only lng and count appear on the wire
    val f = PointPb.Feature(0.0, 30.0, 0, 0, 2L)
    val bytes = PointPb.encode(Seq(f))
    // top(2) + lng(9) + count(2)
    assert(bytes.length == 2 + 9 + 2, s"len ${bytes.length}")
    assert(PointPb.decode(bytes) == Seq(f))
    // proto3 elision is raw-bits: -0.0 is NOT a default and must survive
    val neg = PointPb.Feature(-0.0, 0.0, 1, 0, 1L)
    val decoded = PointPb.decode(PointPb.encode(Seq(neg))).head
    assert(java.lang.Double.doubleToRawLongBits(decoded.lat) ==
      java.lang.Double.doubleToRawLongBits(-0.0), "-0.0 sign bit preserved")
  }

  test("property: PointPb codec round-trips arbitrary feature lists") {
    import graft.io.PointPb
    import org.scalacheck.Gen
    val feature = for {
      lat <- Gen.oneOf(Gen.chooseNum(-90.0, 90.0), Gen.const(0.0))
      lng <- Gen.oneOf(Gen.chooseNum(-180.0, 180.0), Gen.const(0.0))
      bor <- Gen.choose(0, 8)
      year <- Gen.oneOf(Gen.const(0), Gen.choose(1500, 2026))
      count <- Gen.oneOf(Gen.choose(0L, 1000L), Gen.choose(0L, Long.MaxValue))
    } yield PointPb.Feature(lat, lng, bor, year, count)
    val blob = Gen.listOfN(12, feature)
    for (seed <- 0 until 50) {
      val feats = blob(Gen.Parameters.default, org.scalacheck.rng.Seed(4200L + seed))
        .getOrElse(sys.error("generator exhausted"))
      assert(PointPb.decode(PointPb.encode(feats)) == feats, s"seed $seed round-trip")
    }
  }

  test("encodePointsWithPb: both codecs from one scan, borYear unpacked per EncodeBorYearUDF") {
    implicit val s = spark
    // borYear 202403 = (year 2024, bor 3); 4 = (no year, bor 4)
    val points = Seq(
      ("3:view", Seq((10.5, -20.25, 202403, 5L), (0.0, 30.0, 4, 2L)))
    ).toDF("key", "features")
    val out = Sinks.encodePointsWithPb(points).collect()
    assert(out.length == 1)
    val (key, value, pb) = out.head
    assert(key == "3:view")
    assert(Sinks.decodePoints(value) == Seq((10.5, -20.25, 202403, 5L), (0.0, 30.0, 4, 2L)))
    assert(graft.io.PointPb.decode(pb) == Seq(
      graft.io.PointPb.Feature(10.5, -20.25, 3, 2024, 5L),
      graft.io.PointPb.Feature(0.0, 30.0, 4, 0, 2L)))
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
