package graft

import org.apache.spark.sql.functions._
import graft.expr.GramAgg

/** expr.GramAgg: the in-buffer Gram aggregate must equal the explode
  * formulation bit-for-bit, across partitions (merge path), and fail
  * LOUDLY on overflow.
  */
class GramAggSpec extends SparkSpec {
  import spark.implicits._

  private def explodeGram(df: org.apache.spark.sql.DataFrame) = df
    .select(posexplode(col("q")).as(Seq("i", "qi")), col("q"))
    .select(col("i"), col("qi"), posexplode(col("q")).as(Seq("j", "qj")))
    .filter(col("i") <= col("j"))
    .groupBy("i", "j")
    .agg(sum(col("qi") * col("qj")).as("sxy"))

  test("gram aggregate == explode-and-sum, across many partitions (merge path)") {
    val dim = 5
    val vecs = (1 to 200).map(n =>
      Tuple1((0 until dim).map(i => ((n * 7 + i * 13) % 21 - 10).toLong).toArray))
    val df = vecs.toDF("q").repartition(13)
    val g = df.agg(GramAgg.gram(col("q"), dim).as("g"))
      .select(col("g.n"), col("g.sx"), col("g.tri")).head()
    assert(g.getLong(0) == 200L)
    val tri = g.getSeq[Long](2)
    assert(tri.length == dim * (dim + 1) / 2)
    val expect = explodeGram(df).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    var t = 0
    for (i <- 0 until dim; j <- i until dim) {
      assert(tri(t) == expect((i, j)), s"cell ($i,$j)")
      t += 1
    }
    // sx matches plain column sums
    val sx = g.getSeq[Long](1)
    val expSx = df.select(posexplode(col("q")).as(Seq("i", "qi")))
      .groupBy("i").agg(sum("qi")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    (0 until dim).foreach(i => assert(sx(i) == expSx(i), s"sx($i)"))
  }

  test("overflow throws loudly instead of wrapping") {
    val big = Array.fill(2)(3000000000L) // q*q = 9e18 per row: 2 rows overflow
    val df = Seq(Tuple1(big), Tuple1(big)).toDF("q")
    val e = intercept[Exception] {
      df.agg(GramAgg.gram(col("q"), 2)).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(_.isInstanceOf[ArithmeticException]),
      s"expected loud long overflow, got: $e")
  }

  test("dimension mismatch is rejected, not silently truncated") {
    val df = Seq(Tuple1(Array(1L, 2L, 3L))).toDF("q")
    val e = intercept[Exception] { df.agg(GramAgg.gram(col("q"), 4)).collect() }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(c => Option(c.getMessage).exists(_.contains("expected dim"))),
      s"expected dim-mismatch error, got: $e")
  }
}
