package graft

import org.apache.spark.sql.functions._
import graft.expr.KMeansAssign
import graft.llm.Quantizer

class QuantizerSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("training is partition-topology independent (exact-integer Lloyd)") {
    val a = Quantizer.train(fixture, k = 4, iters = 2)
    val b = Quantizer.train(fixture.repartition(7), k = 4, iters = 2)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "repartitioning must not change a single centroid coordinate")
  }

  test("KMeansAssign == driver-side reference argmin with cid tiebreak") {
    val cents = Quantizer.train(fixture, k = 4, iters = 1)
    val got = Quantizer.assignAll(fixture, cents)
      .select("vec_id", "embedding", "cid").collect()
    got.foreach { r =>
      val v = r.getSeq[Float](1).map(x => math.floor(x.toDouble * Quantizer.Scale))
      val dists = cents.map(c => c.zip(v).map { case (ci, qi) =>
        val dl = ci.toDouble - qi; dl * dl }.sum)
      val want = dists.zipWithIndex.minBy { case (dd, cid) => (dd, cid) }._2
      assert(r.getInt(2) == want, s"vec ${r.getLong(0)}")
    }
  }

  test("ties break toward the smaller cid; malformed vectors -> null") {
    val cents = Array(Array(10000L, 0L), Array(-10000L, 0L))
    val df = Seq(
      (1L, Seq(0.0f, 0.5f)),           // equidistant to both -> cid 0
      (2L, Seq(0.7f, 0.1f)),           // nearer c0
      (3L, Seq(0.1f))                  // wrong length -> null
    ).toDF("vec_id", "embedding")
      .select(col("vec_id"),
        KMeansAssign.assign(col("embedding").cast("array<float>"), cents, 10000.0).as("cid"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(df(1L) == 0, "tie -> smaller cid")
    assert(df(2L) == 0)
    assert(df(3L) == -1, "length mismatch -> null")
  }

  test("empty clusters keep their previous centroid") {
    // All vectors identical: every row assigns to one centroid; the other
    // seed position must survive the update untouched.
    val df = Seq.tabulate(6)(i => (i.toLong, Seq.fill(4)(0.5f)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val cents = Quantizer.train(df, k = 2, iters = 2, dim = 4)
    assert(cents.length == 2)
    assert(cents(0).toSeq == Seq.fill(4)(5000L), "winning centroid = exact mean")
    assert(cents(1).toSeq == Seq.fill(4)(5000L),
      "identical seeds: second centroid keeps its (identical) seed position")
  }

  test("probes: head == assignment cell; probes distinct; count == nprobe") {
    val cents = Quantizer.train(fixture, k = 4, iters = 1)
    val rows = fixture
      .select(col("vec_id"),
        graft.expr.KMeansAssign.assign(col("embedding"), cents, Quantizer.Scale.toDouble).as("cid"),
        graft.expr.KMeansProbes.probes(col("embedding"), cents, Quantizer.Scale.toDouble, 2).as("pr"))
      .collect()
    rows.foreach { r =>
      val pr = r.getSeq[Int](2)
      assert(pr.length == 2 && pr.distinct.length == 2, s"vec ${r.getLong(0)}: $pr")
      assert(pr.head == r.getInt(1),
        s"vec ${r.getLong(0)}: first probe is the assignment cell")
    }
  }

  test("assignment plan is narrow: no exchange, no join") {
    val cents = Quantizer.train(fixture, k = 4, iters = 1)
    val plan = Quantizer.assignAll(fixture, cents).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"full-corpus assignment must be a narrow projection:\n$plan")
  }
}
