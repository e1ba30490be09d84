package graft

import org.apache.spark.sql.functions._

import graft.llm.Coreset

/** Greedy k-center selection: Gonzalez invariants + assignment contract. */
class CoresetSpec extends SparkSpec {

  private def embDf(rows: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  /** 1-D points embedded in dim-64 space (only coord 0 varies): distances
    * are squares of coordinate gaps × Scale² — hand-checkable.
    */
  private def points(xs: (Long, Float)*) =
    embDf(xs.map { case (id, x) => id -> (x +: Seq.fill(63)(0.0f)) })

  test("selection replays Gonzalez by hand on a 1-D fixture") {
    // points at 0, 1, 10, 11, 100: first = min id (at 0); farthest = 100;
    // then 10 (min-d2 81 vs {0,100}); then 1 wait — recompute: after
    // {0,100}: min-d2 of 1 is 1, of 10 is 100, of 11 is 121 -> pick 11;
    // after {0,100,11}: 1 -> 1, 10 -> 1 -> coverage 1, tie witness = min
    // vec_id among d2=1 ... ids: 2 (x=1) and 3 (x=10) -> pick 2.
    val df = points(1L -> 0f, 2L -> 1f, 3L -> 10f, 4L -> 11f, 5L -> 100f)
    val s = 10000L * 10000L // quantization scale² turns unit gaps into 1e8
    val rows = Coreset.kcenterRows(df, k = 4)
    assert(rows.map(_._2) == Seq(1L, 5L, 4L, 2L), s"selection order: $rows")
    assert(rows.map(_._3) == Seq(100L * 100L * s, 11L * 11L * s, 1L * s, 1L * s),
      s"coverage curve: $rows")
  }

  test("coverage curve is non-increasing and the witness property holds") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val rows = Coreset.kcenterRows(emb, k = Coreset.K)
    val cov = rows.map(_._3)
    assert(cov.zip(cov.tail).forall { case (a, b) => a >= b },
      s"coverage must not increase: $cov")
    assert(rows.map(_._2).distinct.size == rows.size,
      "centers distinct on a non-degenerate corpus")
    // first center is the smallest vec_id
    val minId = emb.agg(min("vec_id")).collect().head.getLong(0)
    assert(rows.head._2 == minId)
  }

  test("assign: max d2 equals the final coverage; cells partition the corpus") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val rows = Coreset.kcenterRows(emb, k = Coreset.K)
    val asg = Coreset.kcenterAssign(emb, k = Coreset.K).localCheckpoint()
    assert(asg.count() == emb.count(), "every vector assigned")
    val maxD2 = asg.agg(max("d2")).collect().head.getLong(0)
    assert(maxD2 == rows.last._3,
      s"farthest assigned point IS the coverage radius ($maxD2 vs ${rows.last._3})")
    // each center is assigned to itself at distance 0
    val self = asg.filter(col("vec_id") === col("center_vec_id"))
      .select("vec_id", "d2").collect()
    assert(self.length == Coreset.K && self.forall(_.getLong(1) == 0L))
    // cid is the selection round of the assigned center
    val ids = rows.map(_._2)
    asg.select("cid", "center_vec_id").distinct().collect().foreach { r =>
      assert(ids(r.getLong(0).toInt) == r.getLong(1))
    }
  }

  test("malformed min-id vector is skipped, not NPE'd (advice r8)") {
    import spark.implicits._
    // vec_id 0 is the corpus min but wrong-dim; the first center must be
    // the smallest WELL-FORMED id (1), matching nearest()'s filter
    val bad = Seq(0L -> Seq(1.0f)).toDF("vec_id", "embedding")
    val df = points(1L -> 0f, 2L -> 1f, 3L -> 10f).union(bad)
    val rows = Coreset.kcenterRows(df, k = 2)
    assert(rows.map(_._2) == Seq(1L, 3L), rows.toString)

    // all-malformed corpus fails loudly with the well-formed message
    val e = intercept[IllegalArgumentException](Coreset.kcenterRows(bad, k = 2))
    assert(e.getMessage.contains("well-formed"), e.getMessage)
  }
}
