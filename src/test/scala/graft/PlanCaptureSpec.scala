package graft

import org.apache.spark.sql.functions._
import graft.ops.PlanCapture

/** ops.PlanCapture: the audit seam must see the actions a plan audit of the
  * final frame cannot — checkpoint materializations and driver-side
  * metadata collects fired during query construction.
  */
class PlanCaptureSpec extends SparkSpec {

  test("capture surfaces the parquet scan hidden behind a localCheckpoint") {
    val d = "/root/testdata/sf0.001"
    val (df, builds) = PlanCapture.capture(spark) {
      Tables.documents(spark, d)
        .select(col("doc_id"), col("source"))
        .localCheckpoint()
        .groupBy("source").agg(count(lit(1)).as("n"))
    }
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(!finalPlan.contains("FileScan parquet"),
      s"checkpoint-rooted final plan should read blocks, not files:\n$finalPlan")
    assert(builds.nonEmpty, "the checkpoint action must be captured")
    val buildPlans = builds.map(_.qe.executedPlan.toString)
    assert(buildPlans.exists(_.contains("FileScan parquet")),
      s"the build action must expose the hidden scan:\n${buildPlans.mkString("\n---\n")}")
  }

  test("capture is scoped: actions outside the thunk are not recorded") {
    val d = "/root/testdata/sf0.001"
    val (_, builds) = PlanCapture.capture(spark) { 42 }
    assert(builds.isEmpty, s"no actions ran inside the thunk: $builds")
    // an action AFTER capture must not retro-register anywhere
    Tables.documents(spark, d).limit(1).collect()
  }
}
