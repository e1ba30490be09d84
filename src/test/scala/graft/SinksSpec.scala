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
