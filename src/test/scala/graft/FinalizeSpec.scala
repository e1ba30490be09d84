package graft

import org.apache.spark.sql.functions._
import graft.ops.Finalize

/** Finalize: atomic pointer swap + keep-newest-2 retention — the reference's
  * FinaliseBackfill contract over the session catalog.
  */
class FinalizeSpec extends SparkSpec {
  import spark.implicits._

  private val db = "fin_spec"
  private val prefix = "maps"

  private def writeGen(mode: String, stamp: String, n: Int): Unit = {
    val t = Finalize.tableName(prefix, mode, stamp)
    (1 to n).map(i => (i.toLong, s"$mode-$stamp")).toDF("id", "payload")
      .createOrReplaceTempView("__gen_src")
    spark.sql(s"DROP TABLE IF EXISTS $db.$t")
    spark.sql(s"CREATE TABLE $db.$t USING parquet AS SELECT * FROM __gen_src")
  }

  test("publish swaps the live pointer atomically; readers always see a complete table") {
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    spark.sql(s"CREATE DATABASE $db")

    writeGen("points", "20240101_0000", 10)
    Finalize.publish(spark, db, prefix, "points", "20240101_0000")
    assert(Finalize.currentTarget(spark, db, prefix, "points")
      .contains("maps_points_20240101_0000"))
    assert(spark.table(s"$db.maps_points_current").count() == 10)

    // second generation goes live only after its CTAS completed
    writeGen("points", "20240102_0000", 20)
    Finalize.publish(spark, db, prefix, "points", "20240102_0000")
    assert(Finalize.currentTarget(spark, db, prefix, "points")
      .contains("maps_points_20240102_0000"))
    assert(spark.table(s"$db.maps_points_current").count() == 20)

    // publishing a generation that was never written must refuse and leave
    // the pointer untouched — this is the no-partial-reads contract
    intercept[IllegalArgumentException] {
      Finalize.publish(spark, db, prefix, "points", "20240103_0000")
    }
    assert(spark.table(s"$db.maps_points_current").count() == 20,
      "failed publish must not move the pointer")
  }

  test("cleanup keeps the newest 2 generations and never drops an in-use table") {
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    spark.sql(s"CREATE DATABASE $db")

    for ((stamp, n) <- Seq(("20240101_0000", 1), ("20240102_0000", 2),
        ("20240103_0000", 3), ("20240104_0000", 4)))
      writeGen("tiles", stamp, n)

    // live pointer parked on the OLDEST generation
    Finalize.publish(spark, db, prefix, "tiles", "20240101_0000")
    val dropped = Finalize.cleanup(spark, db, prefix, "tiles", keep = 2)
    assert(dropped == Seq("maps_tiles_20240102_0000"),
      s"keep newest 2 + the in-use oldest; dropped: $dropped")
    assert(Finalize.generations(spark, db, prefix, "tiles") ==
      Seq("maps_tiles_20240101_0000", "maps_tiles_20240103_0000",
        "maps_tiles_20240104_0000"))
    // the live pointer still resolves
    assert(spark.table(s"$db.maps_tiles_current").count() == 1)

    // repoint to the newest, clean again: the old in-use table is now fair game
    Finalize.publish(spark, db, prefix, "tiles", "20240104_0000")
    val dropped2 = Finalize.cleanup(spark, db, prefix, "tiles", keep = 2)
    assert(dropped2 == Seq("maps_tiles_20240101_0000"))
    assert(Finalize.generations(spark, db, prefix, "tiles") ==
      Seq("maps_tiles_20240103_0000", "maps_tiles_20240104_0000"))
  }

  test("cleanup survives a dangling pointer: a view whose base table was dropped out-of-band reads as no-live-target") {
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    spark.sql(s"CREATE DATABASE $db")

    writeGen("points", "20240101_0000", 1)
    Finalize.publish(spark, db, prefix, "points", "20240101_0000")
    // out-of-band drop leaves maps_points_current dangling
    spark.sql(s"DROP TABLE $db.maps_points_20240101_0000")
    assert(Finalize.currentTarget(spark, db, prefix, "points").isEmpty,
      "dangling pointer must read as no live target, not crash")

    // retention for the UNRELATED tiles mode must still work
    for ((stamp, n) <- Seq(("20240101_0000", 1), ("20240102_0000", 2),
        ("20240103_0000", 3)))
      writeGen("tiles", stamp, n)
    assert(Finalize.cleanup(spark, db, prefix, "tiles", keep = 2) ==
      Seq("maps_tiles_20240101_0000"),
      "cleanup must not abort on the other mode's dangling pointer")
  }

  test("retention is per mode and respects the other mode's pointer") {
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    spark.sql(s"CREATE DATABASE $db")

    writeGen("points", "20240101_0000", 1)
    writeGen("tiles", "20240101_0000", 1)
    writeGen("tiles", "20240102_0000", 2)
    writeGen("tiles", "20240103_0000", 3)
    Finalize.publish(spark, db, prefix, "points", "20240101_0000")
    Finalize.publish(spark, db, prefix, "tiles", "20240103_0000")

    // cleaning tiles must not consider (or touch) the points generation
    assert(Finalize.cleanup(spark, db, prefix, "tiles", keep = 2) ==
      Seq("maps_tiles_20240101_0000"))
    assert(Finalize.generations(spark, db, prefix, "points") ==
      Seq("maps_points_20240101_0000"))
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }
}
