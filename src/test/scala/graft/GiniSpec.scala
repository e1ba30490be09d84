package graft

import org.apache.spark.sql.functions._
import graft.ops.Gini

/** ops.Gini: exact closed-form Gini ppm on hand-computed distributions. */
class GiniSpec extends SparkSpec {
  import spark.implicits._

  test("hand values [1,1,2,4]: G = 10/32 = 312500 ppm") {
    val df = Seq((10L, 1L), (11L, 1L), (12L, 2L), (13L, 4L)).toDF("id", "v")
    val r = Gini.ppm(df, "id", "v").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 8L, 312500L)))
  }

  test("perfect equality pins 0; tie order never matters") {
    val df = Seq((1L, 3L), (2L, 3L), (3L, 3L)).toDF("id", "v")
    val r = Gini.ppm(df, "id", "v").collect()(0)
    assert(r.getLong(2) == 0L)
    // heavy ties + one hub: [1]*9 ++ [91] → Σv=100, Σi·v = 45 + 910 = 955
    // → (1910 − 11·100)·1e6 / (10·100) = 810000
    val skew = ((1 to 9).map(i => (i.toLong, 1L)) :+ (10L, 91L)).toDF("id", "v")
    assert(Gini.ppm(skew, "id", "v").collect()(0).getLong(2) == 810000L)
  }

  test("empty and all-zero inputs pin 0 without dividing") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
    val r0 = Gini.ppm(empty, "id", "v").collect()(0)
    assert((r0.getLong(0), r0.getLong(1), r0.getLong(2)) == ((0L, 0L, 0L)))
    val zeros = Seq((1L, 0L), (2L, 0L)).toDF("id", "v")
    assert(Gini.ppm(zeros, "id", "v").collect()(0).getLong(2) == 0L)
  }
}
