package graft

import org.apache.spark.sql.functions._
import graft.ops.BloomJoin

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def big = Seq.tabulate(1000) { i =>
    (i.toLong, (i % 97).toLong)
  }.toDF("row_id", "k")

  private def dim = Seq(3L, 7L, 42L, 1000L).toDF("k") // 1000 matches nothing

  test("semiJoin equals the plain exact semi join") {
    val expected = big.join(dim.distinct(), Seq("k"), "left_semi")
      .as[(Long, Long)].collect().toSet
    val got = BloomJoin.semiJoin(big, dim, "k", estItems = 100L)
      .as[(Long, Long)].collect().toSet
    assert(got == expected && got.nonEmpty)
  }

  test("empty dim yields empty result (null sketch handled)") {
    assert(BloomJoin.semiJoin(big, dim.filter(lit(false)), "k").count() == 0L)
  }

  test("bloom never false-negatives: pre-filter retains every true match") {
    val bf = BloomJoin.bloomOf(dim, "k", estItems = 100L)
      .head().getAs[Array[Byte]]("bf")
    val lost = big.join(dim.distinct(), Seq("k"), "left_semi")
      .filter(!BloomJoin.mightContain(bf, col("k")))
      .count()
    assert(lost == 0L)
  }

  test("mixed key types: INT dim vs BIGINT big loses no matching rows") {
    // xxhash64 hashes raw bytes per input type — without the common-type
    // cast an IntegerType dim key and LongType big key holding the same
    // value hash differently and the bloom false-negatives matches away.
    val dimInt = Seq(3, 7, 42, 1000).toDF("k").select(col("k").cast("int").as("k"))
    val expected = big.join(dimInt.select(col("k").cast("long").as("k")).distinct(),
        Seq("k"), "left_semi")
      .as[(Long, Long)].collect().toSet
    val got = BloomJoin.semiJoin(big, dimInt, "k", estItems = 100L)
      .as[(Long, Long)].collect().toSet
    assert(got == expected && got.nonEmpty,
      s"mixed-type semi join dropped rows: got ${got.size}, want ${expected.size}")
  }

  test("plan guard: might_contain filters the big side BEFORE the semi join") {
    // a real file source: over a LocalRelation, Catalyst folds the bloom
    // filter into the scan at plan time and the guard has nothing to see
    val dir = java.nio.file.Files.createTempDirectory("bloom").toString
    big.write.mode("overwrite").parquet(dir)
    val bigFile = spark.read.parquet(dir)
    val plan = BloomJoin.semiJoin(bigFile, dim, "k", estItems = 100L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
    // the filter must sit under the join, not over it: the join's big-side
    // subtree (everything after the join node line) carries the filter
    val joinLine = plan.linesIterator.indexWhere(_.contains("Join"))
    val filterLine = plan.linesIterator.indexWhere(_.contains("might_contain"))
    assert(joinLine >= 0 && filterLine > joinLine, plan.take(2000))
  }
}
