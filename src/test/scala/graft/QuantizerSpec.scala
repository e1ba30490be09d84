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

  test("sampled training: deterministic hash-ranked sample, bounded Lloyd scans") {
    // the sample is a reproducible prefix of the phash total order —
    // topology-independent like the seeds
    val s1 = Quantizer.trainingSample(fixture, 10).select("vec_id")
      .collect().map(_.getLong(0)).toSeq
    val s2 = Quantizer.trainingSample(fixture.repartition(7), 10).select("vec_id")
      .collect().map(_.getLong(0)).toSeq
    assert(s1 == s2 && s1.size == 10, "sample must be topology-independent")

    // plan audit: the limit executes as a distributed top-k, not a global
    // sort — the property that keeps sampled training cheap at any corpus
    val plan = Quantizer.trainingSample(fixture, 10).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"sample must be a distributed top-k:\n$plan")

    // trainSampled == train on the materialized sample (one code path)
    val a = Quantizer.trainSampled(fixture, maxRows = 40, k = 4, iters = 2)
    val b = Quantizer.train(Quantizer.trainingSample(fixture, 40), k = 4, iters = 2)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)

    // and a sample covering the whole fixture reproduces full training
    val full = Quantizer.train(fixture, k = 4, iters = 2)
    val capped = Quantizer.trainSampled(fixture, maxRows = Int.MaxValue, k = 4, iters = 2)
    assert(full.map(_.toSeq).toSeq == capped.map(_.toSeq).toSeq)
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

  test("PQ: codes in range, encoding narrow, sub-training partition-independent") {
    val books = Quantizer.pqTrain(fixture)
    assert(books.length == Quantizer.PqM)
    val booksB = Quantizer.pqTrain(fixture.repartition(5))
    assert(books.map(_.map(_.toSeq).toSeq) == booksB.map(_.map(_.toSeq).toSeq),
      "per-subspace codebooks are topology-independent")
    val codes = Quantizer.pqEncode(fixture, books)
    val plan = codes.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"PQ encoding must be a narrow projection:\n$plan")
    (0 until Quantizer.PqM).foreach { j =>
      val bad = codes.filter(col(s"code_$j") < 0 || col(s"code_$j") >= Quantizer.PqK).count()
      assert(bad == 0, s"subspace $j codes out of [0, ${Quantizer.PqK})")
    }
  }

  test("PQ ADC: an exact duplicate vector is its twin's nearest neighbor at distance == own reconstruction error") {
    // plant an exact duplicate pair: identical vectors share codes, so
    // ADC(q, dup) == ADC(q, decode(q)) — the quantization error itself —
    // and nothing can rank closer than your own reconstruction
    val base = fixture.limit(50).select("vec_id", "embedding")
    val dup = base.filter(col("vec_id") === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val emb = base.union(dup)
    val coarse = Quantizer.train(emb)
    val books = Quantizer.pqTrain(emb)
    val top = Quantizer.pqTopK(emb, coarse, books, col("vec_id") === 0, topK = 3)
      .orderBy("rnk").collect()
    assert(top.nonEmpty, "query cell contains at least the duplicate")
    assert(top.head.getLong(1) == 100000L,
      s"the exact duplicate must rank first, got ${top.toSeq}")
    assert(top.head.getLong(2) <= top.last.getLong(2), "ADC ascending")
  }

  test("PQ ADC equals the brute-force integer distance to the decoded vector") {
    val emb = fixture.limit(40)
    val coarse = Quantizer.train(emb)
    val books = Quantizer.pqTrain(emb)
    // reference: decode codes driver-side and compute sum((q - d)^2) exactly
    val codes = Quantizer.pqEncode(emb, books).collect()
      .map(r => r.getLong(0) -> (0 until Quantizer.PqM).map(j => r.getInt(j + 1))).toMap
    val vecs = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x => math.floor(x * 10000.0).toLong))
      .toMap
    def decoded(id: Long): Seq[Long] =
      (0 until Quantizer.PqM).flatMap(j => books(j)(codes(id)(j)))
    val got = Quantizer.pqTopK(emb, coarse, books, lit(true), topK = 1000)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    got.foreach { case ((q, n), adc) =>
      val want = vecs(q).zip(decoded(n)).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(adc == want, s"ADC($q,$n): engine $adc vs reference $want")
    }
    assert(got.nonEmpty)
  }

  test("inertia equals the brute-force integer SSE per assigned cell") {
    val emb = fixture.limit(60)
    val cents = Quantizer.train(emb, k = 4, iters = 2)
    val assigned = Quantizer.assignAll(emb, cents)
      .select(col("vec_id"), col("embedding"), col("cid")).collect()
      .map(r => (r.getSeq[Float](1).map(x => math.floor(x * 10000.0).toLong),
        r.getInt(2)))
    val want = assigned.groupBy(_._2).map { case (cid, xs) =>
      val sses = xs.map { case (q, _) =>
        q.zip(cents(cid)).map { case (a, b) => (a - b) * (a - b) }.sum
      }
      cid -> (xs.length.toLong, sses.sum, sses.sum / xs.length)
    }
    val got = Quantizer.inertia(emb, cents).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want, s"engine $got vs reference $want")
    assert(got.values.map(_._1).sum == 60L, "every vector lands in one cell")
  }
}
