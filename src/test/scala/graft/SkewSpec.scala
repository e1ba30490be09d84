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

  test("sizeHistogram: exact power-of-two buckets, mass conserved") {
    import spark.implicits._
    // sizes 1, 3, 4, 8: buckets 0, 1, 2, 3 (exact powers land in their own
    // bucket — the float-log2 boundary hazard the bit form avoids)
    val df = (Seq.fill(1)("a") ++ Seq.fill(3)("b") ++ Seq.fill(4)("c") ++
      Seq.fill(8)("d")).toDF("k")
    val h = Skew.sizeHistogram(df, "k").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(h == Map(
      0L -> ((1L, 1L, 1L)), 1L -> ((1L, 3L, 3L)),
      2L -> ((1L, 4L, 4L)), 3L -> ((1L, 8L, 8L))))
  }

  test("saltPlan: only keys above mult x mean surface, with ceil salt") {
    import spark.implicits._
    // sizes: a=2, b=2, c=20 -> total 24, n_keys 3, mean 8; mult=2 -> thr 16
    val df = (Seq.fill(2)("a") ++ Seq.fill(2)("b") ++ Seq.fill(20)("c")).toDF("k")
    val plan = Skew.saltPlan(df, "k", mult = 2L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(plan.toSeq == Seq(("c", 20L, 16L, 2L)))
  }

  test("saltPlan: the structural ALL-view key is always in the plan") {
    val plan = Skew.saltPlan(exploded, "map_key", mult = 4L).collect()
      .map(_.getString(0))
    assert(plan.contains("0:0"), "the every-record view must be flagged heavy")
  }
}
