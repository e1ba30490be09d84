package graft

import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("banded interval join == naive theta join on random points/ranges") {
    val rnd = new scala.util.Random(11)
    val points = Seq.tabulate(500)(i => (i.toLong, rnd.nextLong(100000L))).toDF("pid", "t")
    val ranges = Seq.tabulate(60) { i =>
      val lo = rnd.nextLong(95000L)
      (i.toLong, lo, lo + 1 + rnd.nextLong(8000L)) // spans 0–8 buckets at w=1000
    }.toDF("rid", "lo", "hi")
    val banded = RangeJoin.pointInRange(points, "t", ranges, "lo", "hi", 1000L)
      .select("pid", "rid").as[(Long, Long)].collect().toSet
    val naive = points.join(ranges, col("t") >= col("lo") && col("t") < col("hi"))
      .select("pid", "rid").as[(Long, Long)].collect().toSet
    assert(banded == naive, s"banded=${banded.size} naive=${naive.size}")
    assert(naive.nonEmpty, "fixture must actually produce matches")
  }

  test("half-open boundary semantics: lo inclusive, hi exclusive, no duplicate pairs") {
    val points = Seq((1L, 100L), (2L, 199L), (3L, 200L), (4L, 99L)).toDF("pid", "t")
    val ranges = Seq((7L, 100L, 200L)).toDF("rid", "lo", "hi")
    // bucket width far smaller than the span: the range covers many buckets
    val out = RangeJoin.pointInRange(points, "t", ranges, "lo", "hi", 10L)
      .select("pid").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L), "lo in, hi out, below-lo out; each pair exactly once")
  }

  test("empty and inverted ranges produce zero rows, not exploded buckets") {
    val points = Seq((1L, 100L)).toDF("pid", "t")
    val ranges = Seq(
      (1L, 100L, 100L),      // empty half-open range
      (2L, 1000000L, 0L)     // corrupt inverted range
    ).toDF("rid", "lo", "hi")
    val out = RangeJoin.pointInRange(points, "t", ranges, "lo", "hi", 10L)
    assert(out.count() == 0, "hi <= lo can never contain a point")
    // and the degenerate ranges never reach the explode (no row blow-up):
    // sequence() would emit 100001 buckets for the inverted range at w=10
    val exploded = ranges.filter(col("hi") > col("lo")).count()
    assert(exploded == 0, "both degenerate ranges filtered before banding")
  }

  test("bucketing is exact for negative and >=2^53 domains (epoch nanos)") {
    // floor(t / w) through doubles mis-buckets here: 2^53+1 rounds, and
    // negative values truncate toward zero instead of down. Both sides of
    // each boundary must land with exact-integer bucketing.
    val w = 1000000000L // 1 s in nanos
    val big = (1L << 60) // ~36 years in epoch nanos, far past 2^53
    val points = Seq(
      (1L, big), (2L, big + w - 1), (3L, big + w), // straddle a bucket edge
      (4L, -w), (5L, -1L), (6L, 0L)                // pre-1970 straddle
    ).toDF("pid", "t")
    val ranges = Seq(
      (10L, big, big + w),       // matches pids 1, 2 only
      (20L, -w, 0L)              // matches pids 4, 5 only (0 exclusive)
    ).toDF("rid", "lo", "hi")
    val got = RangeJoin.pointInRange(points, "t", ranges, "lo", "hi", w)
      .select("pid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 10L), (4L, 20L), (5L, 20L)), s"got $got")
  }

  test("keyed variant: bucket collisions across key values never meet") {
    val rnd = new scala.util.Random(13)
    val points = Seq.tabulate(400)(i =>
      (i.toLong, i % 7L, rnd.nextLong(50000L))).toDF("pid", "k", "t")
    val ranges = Seq.tabulate(50) { i =>
      val lo = rnd.nextLong(48000L)
      (i.toLong, i % 7L, lo, lo + 1 + rnd.nextLong(5000L))
    }.toDF("rid", "k", "lo", "hi")
    val keyed = RangeJoin.pointInRangeKeyed(points, "t", ranges, "lo", "hi",
        1000L, keys = Seq("k"))
      .select("pid", "rid").as[(Long, Long)].collect().toSet
    val naive = points.as("p").join(ranges.as("r"),
        col("p.k") === col("r.k") && col("t") >= col("lo") && col("t") < col("hi"))
      .select("pid", "rid").as[(Long, Long)].collect().toSet
    assert(keyed == naive, s"keyed=${keyed.size} naive=${naive.size}")
    assert(naive.nonEmpty, "fixture must actually produce matches")
    // same-bucket different-key pairs must NOT appear
    val unkeyed = RangeJoin.pointInRange(points.drop("k"), "t",
        ranges.drop("k"), "lo", "hi", 1000L)
      .select("pid", "rid").as[(Long, Long)].collect().toSet
    assert(unkeyed.size > keyed.size, "dropping the key must widen the match set")
  }

  test("IntMath.floorDiv agrees with Math.floorDiv across the long range") {
    val vals = Seq(Long.MinValue + 1, -(1L << 60) - 7, -1000001L, -1L, 0L, 1L,
      999999L, (1L << 53) + 1, (1L << 60) + 3, Long.MaxValue)
    val widths = Seq(1L, 7L, 1000000L, 1L << 40)
    for (w <- widths) {
      val got = vals.toDF("x")
        .select(graft.expr.IntMath.floorDiv(col("x"), w)).as[Long].collect()
      val want = vals.map(Math.floorDiv(_, w))
      assert(got.toSeq == want, s"w=$w: got ${got.toSeq}, want $want")
    }
  }

  test("the plan is an equi-join on the bucket key, not a nested loop") {
    val points = Seq.tabulate(100)(i => (i.toLong, i.toLong * 7)).toDF("pid", "t")
    val ranges = Seq.tabulate(10)(i => (i.toLong, i * 50L, i * 50L + 30L)).toDF("rid", "lo", "hi")
    val plan = RangeJoin.pointInRange(points, "t", ranges, "lo", "hi", 50L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must not plan a nested loop:\n$plan")
  }
}
