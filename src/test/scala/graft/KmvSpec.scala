package graft

import org.apache.spark.sql.functions._
import graft.ops.Kmv

class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("small groups: sketch is exact and estimates degrade to truth") {
    // two groups of 10 ids sharing exactly 4 -> jaccard 4/16 = 0.25
    val dp = ((0L until 10L).map(("a", _)) ++ (6L until 22L).map(("b", _)))
      .toDF("g", "id").distinct()
    val sk = Kmv.sketchByGroup(dp, "g", "id", k = 64, seed = "t")
    val out = Kmv.overlapEstimates(sk, "g", "id", k = 64).collect().head
    assert(out.getAs[Long]("k_eff") == 10L)
    assert(out.getAs[Long]("na_est") == 10L && out.getAs[Long]("nb_est") == 16L,
      "below-k groups report exact sizes")
    // brute-force the estimator's own definition: union k_eff-set = the 10
    // smallest hashes of A ∪ B; rho = how many of those are in A ∩ B
    val h = (0L until 22L).map(i => i -> graft.expr.PortableHash.phashLocal(s"t:$i")).toMap
    val unionK = (0L until 22L).sortBy(h).take(10)
    val expectedRho = unionK.count(i => i >= 6L && i < 10L).toLong
    assert(out.getAs[Long]("rho") == expectedRho, s"rho vs brute $expectedRho")
    assert(out.getAs[Long]("jaccard_est_ppm") == expectedRho * 1000000L / 10L)
  }

  test("estimate regime: 50%-overlap sets land near jaccard 1/3 and true sizes") {
    // A = [0, 5000), B = [2500, 7500): |A∩B| = 2500, |A∪B| = 7500
    val dp = ((0L until 5000L).map(("a", _)) ++ (2500L until 7500L).map(("b", _)))
      .toDF("g", "id")
    val sk = Kmv.sketchByGroup(dp, "g", "id", k = 256, seed = "t2")
    val out = Kmv.overlapEstimates(sk, "g", "id", k = 256).collect().head
    val jac = out.getAs[Long]("jaccard_est_ppm") / 1e6
    assert(math.abs(jac - 1.0 / 3) < 0.08, s"jaccard est $jac vs 0.333")
    val na = out.getAs[Long]("na_est")
    val nb = out.getAs[Long]("nb_est")
    assert(math.abs(na - 5000) < 1000 && math.abs(nb - 5000) < 1000,
      s"distinct ests $na/$nb vs 5000 (k=256 => ~6% rel error expected)")
  }

  test("sketch prefilter loses nothing: k smallest hashes survive intact") {
    val dp = (0L until 3000L).map(("g1", _)).toDF("g", "id")
    val sk = Kmv.sketchByGroup(dp, "g", "id", k = 32, seed = "t3")
      .orderBy("rnk").collect().map(r => (r.getAs[Long]("hv"), r.getAs[Int]("rnk")))
    val brute = (0L until 3000L)
      .map(i => graft.expr.PortableHash.phashLocal(s"t3:$i")).sorted.take(32)
    assert(sk.map(_._1).toSeq == brute, "sketch == brute-force k smallest hashes")
    assert(sk.map(_._2).toSeq == (1 to 32), "ranks dense 1..k")
  }

  test("union estimates: exact on whole-group sketches, near-truth in the estimate regime") {
    // exact regime: both sketches whole groups ⇒ the member stream IS
    // A ∪ B, so union (22) and intersection (4) are exact counts — k_eff
    // never truncates a complete stream
    val dp = ((0L until 10L).map(("a", _)) ++ (6L until 22L).map(("b", _)))
      .toDF("g", "id").distinct()
    val sk = Kmv.sketchByGroup(dp, "g", "id", k = 64, seed = "t")
    val out = Kmv.unionEstimates(sk, "g", "id", k = 64).collect().head
    assert(out.getAs[Long]("n_union_est") == 22L, "whole-group union is exact")
    assert(out.getAs[Long]("n_inter_est") == 4L, "whole-group intersection is exact")
    // estimate regime: |A ∪ B| = 7500, |A ∩ B| = 2500 with k = 256 -> ~10%
    val dp3 = ((0L until 5000L).map(("a", _)) ++ (2500L until 7500L).map(("b", _)))
      .toDF("g", "id")
    val sk3 = Kmv.sketchByGroup(dp3, "g", "id", k = 256, seed = "t2")
    val out3 = Kmv.unionEstimates(sk3, "g", "id", k = 256).collect().head
    assert(out3.getAs[Long]("k_u") == 256L, "truncated sketches rank to k_eff")
    val u = out3.getAs[Long]("n_union_est")
    val i3 = out3.getAs[Long]("n_inter_est")
    assert(math.abs(u - 7500) < 800, s"union est $u vs 7500")
    assert(math.abs(i3 - 2500) < 800, s"intersection est $i3 vs 2500")
  }

  test("prefilter-truncated sketch falls to the estimator, never fake-exact") {
    // Hand-build the pathological shape ADVICE flagged: group 'a' is LARGE
    // (n_g = 1000) but the Chernoff prefilter (by bad luck) kept only 5 of
    // its hashes — k_g < k must NOT be read as "exact distinct = 5".
    val k = 64
    val aRows = (1 to 5).map(i => ("a", i.toLong, i * 100000000L, i, 1000L))
    val bRows = (1 to 3).map(i => ("b", 100L + i, i * 200000000L, i, 3L))
    val sk = (aRows ++ bRows).toDF("g", "id", "hv", "rnk", "n_g")
    val out = Kmv.overlapEstimates(sk, "g", "id", k).collect().head
    // group b: k_g == n_g == 3 -> exact
    assert(out.getAs[Long]("nb_est") == 3L, "whole-group sketch stays exact")
    // group a: k_g = 5 < n_g = 1000 -> (k_g-1)*2^32 div h_k, not 5
    val expected = 4L * (1L << 32) / 500000000L
    assert(out.getAs[Long]("na_est") == expected,
      s"truncated sketch must estimate ($expected), got ${out.getAs[Long]("na_est")}")
  }
}
