package graft

import org.apache.spark.sql.functions._
import graft.analog.{OccurrenceAnalog => OA}
import graft.ops.Skew

/** Salting must never change results — verified on the engine's real skew
  * source: the exploded map views, where `0:0` holds every record.
  */
class SkewSpec extends SparkSpec {

  private def exploded = {
    val ev = Tables.events(spark, "/root/testdata/sf0.001").filter(OA.qualityFilter)
    ev.select(col("event_id"), col("user_id"), explode(OA.mapKeysArray).as("map_key"))
  }

  test("saltedAgg == direct agg on the skewed view counts") {
    val direct = exploded.groupBy("map_key")
      .agg(count(lit(1)).as("n"), sum("user_id").as("s"))
      .orderBy("map_key").collect().map(_.toSeq).toSeq
    val salted = Skew.saltedAgg(exploded, Seq("map_key"), col("event_id"), 8)(
        phase1 = Seq(count(lit(1)).as("pn"), sum("user_id").as("ps")),
        phase2 = Seq(sum("pn").as("n"), sum("ps").as("s")))
      .orderBy("map_key").collect().map(_.toSeq).toSeq
    assert(salted == direct)
  }

  test("saltedJoin == plain join on a skewed key") {
    val stats = exploded.groupBy("map_key").agg(count(lit(1)).as("view_n"))
    val plain = exploded.join(stats, Seq("map_key"))
      .groupBy("map_key").agg(count(lit(1)).as("n"), max("view_n").as("vn"))
      .orderBy("map_key").collect().map(_.toSeq).toSeq
    val salted = Skew.saltedJoin(exploded, stats, "map_key", col("event_id"), 8)
      .groupBy("map_key").agg(count(lit(1)).as("n"), max("view_n").as("vn"))
      .orderBy("map_key").collect().map(_.toSeq).toSeq
    assert(salted == plain)
  }

  test("salting actually spreads the hot key across partitions") {
    val spread = exploded.filter(col("map_key") === "0:0")
      .withColumn("__salt", pmod(hash(col("event_id")), lit(8)))
      .groupBy("__salt").count().collect()
    assert(spread.length == 8, "all 8 salt buckets hit for the hot key")
  }
}
