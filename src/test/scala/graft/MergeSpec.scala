package graft

import org.apache.spark.sql.functions._
import graft.ops.Merge

/** MERGE scaffold contracts: the full-outer shape and its broadcast-
  * friendly split twin must emit identical rows, and the split twin must
  * actually broadcast a small update batch.
  */
class MergeSpec extends SparkSpec {

  import spark.implicits._

  private def dim = Seq((1L, "A", 10.0), (2L, "B", 20.0), (4L, "D", 40.0))
    .toDF("k", "seg", "bal")
  private def upd = Seq((2L, 5.0), (3L, 7.0)).toDF("k", "spend")

  private def canon(f: org.apache.spark.sql.DataFrame) =
    f.select(col("k"), col("action"), col("seg"), col("bal"), col("spend"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq

  test("outerMerge classifies updated/inserted/unchanged") {
    val m = Merge.outerMerge(dim, upd, "k")
    val byAction = m.groupBy("action").count().as[(String, Long)].collect().toMap
    assert(byAction == Map("updated" -> 1L, "inserted" -> 1L, "unchanged" -> 2L))
    // key coalesced from whichever side is present
    assert(m.select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("split twin emits identical rows to the full-outer shape") {
    assert(canon(Merge.outerMergeSplit(dim, upd, "k")) ==
      canon(Merge.outerMerge(dim, upd, "k")))
  }

  test("split twin broadcasts a small CDC batch; full outer cannot") {
    val bigDim = spark.range(0, 100000)
      .select(col("id").as("k"), lit("X").as("seg"))
    val smallUpd = spark.range(0, 10).select(col("id").as("k"), lit(1L).as("v"))
    val split = Merge.outerMergeSplit(bigDim, smallUpd, "k")
    val splitPlan = split.queryExecution.executedPlan.toString
    assert(splitPlan.contains("BroadcastHashJoin"),
      "matched/anti legs should broadcast the small update side")
    val outer = Merge.outerMerge(bigDim, smallUpd, "k")
    val outerPlan = outer.queryExecution.executedPlan.toString
    assert(!outerPlan.contains("BroadcastHashJoin"),
      "full-outer join is not broadcast-able — which is why the split exists")
  }
}
