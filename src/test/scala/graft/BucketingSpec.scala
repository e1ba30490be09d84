package graft

import org.apache.spark.sql.functions._
import graft.io.Bucketing

class BucketingSpec extends SparkSpec {

  test("bucketed equi-join runs with zero shuffle exchanges and exact results") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast path
    try {
      val sf = "/root/testdata/sf0.001"
      val li = Tables.lineitem(spark, sf)
      val o = Tables.orders(spark, sf)
      Bucketing.writeBucketed(li, "li_b", "l_orderkey", 8, Some("l_orderkey"))
      Bucketing.writeBucketed(o, "o_b", "o_orderkey", 8, Some("o_orderkey"))

      val joined = Bucketing.table(spark, "li_b")
        .join(Bucketing.table(spark, "o_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))

      // the join itself must be exchange-free; only the groupBy shuffles
      assert(Bucketing.countShuffles(joined) <= 1,
        s"bucketed join should not shuffle its inputs:\n${joined.queryExecution.executedPlan}")

      // identical results to the plain (shuffled) join
      val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))
      val a = joined.orderBy("o_orderpriority").collect().map(_.toSeq).toSeq
      val b = plain.orderBy("o_orderpriority").collect().map(_.toSeq).toSeq
      assert(a == b)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
