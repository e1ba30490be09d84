package graft

import org.apache.spark.sql.functions._
import graft.expr.Salt
import graft.ops.Backfill

/** Prepare/backfill contract: pre-split target DDL, region-aligned bulk
  * load, and the snapshot-under-barrier build input.
  */
class BackfillSpec extends SparkSpec {
  import spark.implicits._

  private val db = "bf_spec"

  private def freshDb(): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    spark.sql(s"CREATE DATABASE $db")
  }

  test("splitPoints: one region per salt, zero-padded boundaries in key order") {
    assert(Backfill.splitPoints(10) == (1 to 9).map(_.toString))
    val s100 = Backfill.splitPoints(100)
    assert(s100.size == 99 && s100.head == "01" && s100.last == "99")
    assert(s100 == s100.sorted, "boundaries must be lexicographically ordered")
  }

  test("createTarget: tiles get 4 families, points 1; re-create refuses; bad mode refuses pre-DDL") {
    freshDb()
    Backfill.createTarget(spark, db, "tiles_t", "tiles", 10)
    Backfill.createTarget(spark, db, "points_t", "points", 100)
    val props = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("tiles_t", Some(db))).properties
    assert(props("graft.families") == "EPSG_4326,EPSG_3857,EPSG_3575,EPSG_3031")
    assert(props("graft.salt.modulo") == "10")
    assert(props("graft.salt.splits").split(",").length == 9)
    intercept[IllegalArgumentException] {
      Backfill.createTarget(spark, db, "tiles_t", "tiles", 10)
    }
    intercept[IllegalArgumentException] {
      Backfill.createTarget(spark, db, "nope_t", "pixels", 10)
    }
    assert(!spark.catalog.tableExists(s"$db.nope_t"),
      "a refused mode must not leave a half-created table")
  }

  test("bulkLoad: rows land under their declared family with region-aligned salts; undeclared family refuses") {
    freshDb()
    Backfill.createTarget(spark, db, "load_t", "points", 10)
    val kv = (1 to 200).map(i => s"k$i").toDF("k")
      .select(Salt.salted(col("k"), 10).as("key"),
        encode(col("k"), "UTF-8").as("value"))
    Backfill.bulkLoad(spark, db, "load_t", "EPSG_4326", kv)
    val back = spark.table(s"$db.load_t")
    assert(back.count() == 200)
    assert(back.filter(col("family") =!= "EPSG_4326").count() == 0)
    // every key's salt prefix is a region: in [0, modulo), matching the splits
    val salts = back.select(split(col("key"), ":").getItem(0)).as[String]
      .collect().map(_.toInt).toSet
    assert(salts.subsetOf((0 until 10).toSet))
    intercept[IllegalArgumentException] {
      Backfill.bulkLoad(spark, db, "load_t", "EPSG_3857", kv)
    }
  }

  test("bulkLoad: a run salted for a different modulo fails loudly, both directions") {
    freshDb()
    Backfill.createTarget(spark, db, "m10_t", "points", 10)
    Backfill.createTarget(spark, db, "m100_t", "points", 100)
    val kv10 = (1 to 50).map(i => s"k$i").toDF("k")
      .select(Salt.salted(col("k"), 10).as("key"), encode(col("k"), "UTF-8").as("value"))
    val kv100 = (1 to 50).map(i => s"k$i").toDF("k")
      .select(Salt.salted(col("k"), 100).as("key"), encode(col("k"), "UTF-8").as("value"))
    // wider salt into a 10-region table: would be an out-of-range partition
    intercept[Exception] { Backfill.bulkLoad(spark, db, "m10_t", "EPSG_4326", kv100) }
    // narrower salt into a 100-region table: would silently straddle splits
    intercept[Exception] { Backfill.bulkLoad(spark, db, "m100_t", "EPSG_4326", kv10) }
    // matching moduli still load
    Backfill.bulkLoad(spark, db, "m10_t", "EPSG_4326", kv10)
    assert(spark.table(s"$db.m10_t").count() == 50)
  }

  test("withSnapshot: body sees the point-in-time image, not later source writes; snapshot and barrier always cleaned") {
    freshDb()
    (1 to 50).map(i => (i.toLong, s"row$i")).toDF("id", "payload")
      .write.saveAsTable(s"$db.src")
    val seen = Backfill.withSnapshot(spark, db, "src", "snap1") { snap =>
      // source keeps ingesting while the build runs
      Seq((51L, "late")).toDF("id", "payload")
        .write.mode("append").insertInto(s"$db.src")
      snap.count()
    }
    assert(seen == 50, "build must read the frozen image, not the live table")
    assert(spark.table(s"$db.src").count() == 51)
    assert(spark.catalog.listTables(db).collect()
      .forall(t => !t.name.contains("_snap_") && !t.name.contains("_barrier")),
      "snapshot and barrier must not outlive the build")
  }

  test("withSnapshot: cleans up even when the body throws; a held barrier blocks a second snapshotter") {
    freshDb()
    Seq((1L, "x")).toDF("id", "payload").write.saveAsTable(s"$db.src")
    intercept[RuntimeException] {
      Backfill.withSnapshot(spark, db, "src", "boom") { _ =>
        throw new RuntimeException("build failed")
      }
    }
    assert(spark.catalog.listTables(db).collect()
      .forall(t => !t.name.contains("_snap_") && !t.name.contains("_barrier")))

    // hold the barrier by hand: the next snapshotter must refuse, not race
    spark.sql(s"CREATE TABLE $db.src_snapshot_barrier (held INT) USING parquet")
    try intercept[Exception] {
      Backfill.withSnapshot(spark, db, "src", "snap2")(_.count())
    } finally spark.sql(s"DROP TABLE IF EXISTS $db.src_snapshot_barrier")
  }
}
