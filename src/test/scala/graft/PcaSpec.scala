package graft

import org.apache.spark.sql.functions._
import graft.llm.{Pca, Quantizer}

/** llm.Pca: the exact-integer power iteration must behave like PCA —
  * the component must be a genuine dominant direction (Rayleigh quotient
  * at least that of every axis direction), and the whole chain must be
  * deterministic replay-for-replay. Also covers the recall-audit and
  * mutual-kNN keys' structural contracts.
  */
class PcaSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"
  private def embd = Tables.embeddings(spark, d)

  test("pc1 is deterministic across independent runs") {
    val a = Pca.pc1(spark, embd).orderBy("idx").collect().map(_.toSeq).toSeq
    val b = Pca.pc1(spark, embd).orderBy("idx").collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.length == Quantizer.Dim)
  }

  test("pc1 beats every coordinate axis on the Rayleigh quotient") {
    // v^T G v / v^T v for the found component vs the best single axis:
    // the dominant direction can't be worse than any e_i (it maximizes
    // the quotient over the whole sphere; axes are sphere points).
    val g = Pca.meanGram(embd).collect()
      .map(r => ((r.getAs[Long]("i").toInt, r.getAs[Long]("j").toInt),
        r.getAs[Long]("gm"))).toMap
    val dim = Quantizer.Dim
    def rayleigh(v: Array[Double]): Double = {
      var num = 0.0
      for (i <- 0 until dim; j <- 0 until dim)
        num += g.getOrElse((i, j), 0L).toDouble * v(i) * v(j)
      num / v.map(x => x * x).sum
    }
    val comp = new Array[Double](dim)
    Pca.pc1(spark, embd).collect()
      .foreach(r => comp(r.getAs[Long]("idx").toInt) = r.getAs[Long]("v").toDouble)
    val rv = rayleigh(comp)
    for (i <- 0 until dim) {
      val axis = Array.fill(dim)(0.0); axis(i) = 1.0
      // tolerance: the integer truncation costs < 0.1% at fixture scale
      assert(rv >= rayleigh(axis) * 0.999,
        s"component quotient $rv must dominate axis $i (${rayleigh(axis)})")
    }
  }

  test("projections: one row per vector, exact dot of quantized emb and component") {
    val proj = SparkEntry.queries("embedding_pc1")(spark, d)
    assert(proj.count() == embd.count())
    val comp = Pca.pc1(spark, embd).collect()
      .map(r => r.getAs[Long]("idx") -> r.getAs[Long]("v")).toMap
    val sample = embd.limit(5)
      .select(col("vec_id"), Quantizer.quantize(col("embedding")).as("q")).collect()
    val got = proj.collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("proj")).toMap
    for (r <- sample) {
      val q = r.getSeq[Long](1)
      val want = q.zipWithIndex.map { case (x, i) => x * comp(i.toLong) }.sum
      assert(got(r.getLong(0)) == want)
    }
  }

  test("dedup_recall: hits bounded by both sides; ppm ratios consistent") {
    val r = SparkEntry.queries("dedup_recall")(spark, d).collect().head
    val (nt, nc, nh) = (r.getAs[Long]("n_true"), r.getAs[Long]("n_cand"), r.getAs[Long]("n_hit"))
    assert(nh <= nt && nh <= nc)
    assert(r.getAs[Long]("recall_ppm") == nh * 1000000L / math.max(nt, 1L))
    assert(r.getAs[Long]("precision_ppm") == nh * 1000000L / math.max(nc, 1L))
    assert(r.getAs[Long]("n_docs") > 0)
    // the fixture plants real near-dups, so the audit must see signal
    assert(nt > 0, "audit sample must contain true near-dup pairs")
    assert(r.getAs[Long]("recall_ppm") > 0, "LSH must catch at least one true pair")
  }

  test("knn_mutual: edges are symmetric by construction and ranks within k") {
    val edges = SparkEntry.queries("knn_mutual")(spark, d).collect()
    assert(edges.nonEmpty)
    for (e <- edges) {
      assert(e.getAs[Long]("a") < e.getAs[Long]("b"))
      assert(e.getAs[Long]("rank_ab") >= 1 && e.getAs[Long]("rank_ab") <= 3)
      assert(e.getAs[Long]("rank_ba") >= 1 && e.getAs[Long]("rank_ba") <= 3)
    }
    // mutual edges must be a subset of the one-directional top-k list
    val top = graft.llm.Similarity.lshTopK(embd, lit(true), k = 3,
        bitsPerBand = SparkEntry.lshBitsFor(spark, d))
      .select(col("q_id"), col("n_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (e <- edges) {
      val (a, b) = (e.getAs[Long]("a"), e.getAs[Long]("b"))
      assert(top((a, b)) && top((b, a)), s"($a,$b) must appear in both lists")
    }
  }
}
