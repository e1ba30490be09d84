package graft

import org.apache.spark.sql.functions._
import graft.ops.Bootstrap

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  test("weight: Poisson(1)-shaped — bounded by the cap, mean near 1") {
    val draws = spark.range(0, 20000)
      .select(Bootstrap.weight(col("id"), pmod(col("id"), lit(7L))).as("w"))
      .agg(min("w"), max("w"), avg("w")).collect().head
    assert(draws.getLong(0) == 0L)
    assert(draws.getLong(1) <= 5L)
    assert(math.abs(draws.getDouble(2) - 1.0) < 0.05,
      s"mean weight ${draws.getDouble(2)} should be ~1 (Poisson(1))")
  }

  test("percentile ranks: B=100 -> [3, 97] (nearest-lower-rank)") {
    assert(Bootstrap.lowRank(100) == 3L && Bootstrap.highRank(100) == 97L)
    assert(Bootstrap.lowRank(40) == 1L && Bootstrap.highRank(40) == 39L)
  }

  test("meanCi: interval brackets the full-sample mean; partitioning-invariant") {
    val df = (0 until 400).map(i => ("g", i.toLong, 1000L + (i % 21) * 7L))
      .toDF("grp", "id", "cents")
    val a = Bootstrap.meanCi(df.repartition(1), "grp", "id").collect().head
    val b = Bootstrap.meanCi(df.repartition(13), "grp", "id").collect().head
    assert(a == b, "CI must not depend on partitioning")
    val (n, mean, lo, hi) =
      (a.getLong(1), a.getLong(2), a.getLong(3), a.getLong(4))
    assert(n == 400L)
    assert(lo <= mean && mean <= hi, s"[$lo, $hi] should bracket $mean")
    assert(hi - lo < 100000L, "CI of a bounded variable over 400 rows is tight")
  }
}
