package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.llm.Sample
import graft.expr.PortableHash

class SampleSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq.tabulate(900) { i =>
    (i.toLong, if (i % 3 == 0) "en" else if (i % 3 == 1) "fr" else "de")
  }.toDF("doc_id", "lang")

  test("exactly k rows per group, ranked 1..k in hash order") {
    val out = Sample.reservoirByGroup(corpus, "lang", "doc_id", k = 10, seed = "s1")
    val perGroup = out.groupBy("lang").agg(count(lit(1)).as("n"), max("rnk").as("mx"))
      .as[(String, Long, Int)].collect().map { case (l, n, m) => l -> ((n, m)) }.toMap
    assert(perGroup.size == 3 && perGroup.values.forall(_ == ((10L, 10))), s"$perGroup")
  }

  test("the sample IS the k smallest hashes per group (prefilter loses nothing)") {
    val k = 10
    val hv = PortableHash.phash(
      concat_ws(":", lit("s1"), col("lang"), col("doc_id").cast("string")))
    val brute = corpus.select(col("lang"), col("doc_id"), hv.as("hv"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("lang").orderBy(col("hv"), col("doc_id"))))
      .filter(col("rnk") <= k)
      .select("lang", "doc_id", "rnk").as[(String, Long, Int)].collect().toSet
    val fast = Sample.reservoirByGroup(corpus, "lang", "doc_id", k, "s1")
      .as[(String, Long, Int)].collect().toSet
    assert(fast == brute)
  }

  test("groups smaller than k keep every row; result is partition-independent") {
    val tiny = Seq((1L, "en"), (2L, "en"), (3L, "fr")).toDF("doc_id", "lang")
    val out = Sample.reservoirByGroup(tiny, "lang", "doc_id", k = 10, seed = "s2")
    assert(out.count() == 3, "undersized groups pass through whole")

    val a = Sample.reservoirByGroup(corpus, "lang", "doc_id", 5, "s3")
      .as[(String, Long, Int)].collect().toSet
    val b = Sample.reservoirByGroup(corpus.repartition(13), "lang", "doc_id", 5, "s3")
      .as[(String, Long, Int)].collect().toSet
    assert(a == b, "same sample on any input partitioning")
  }

  test("different seeds draw different samples; same seed replays") {
    val s1 = Sample.reservoirByGroup(corpus, "lang", "doc_id", 10, "seed-a")
      .as[(String, Long, Int)].collect().toSet
    val s1b = Sample.reservoirByGroup(corpus, "lang", "doc_id", 10, "seed-a")
      .as[(String, Long, Int)].collect().toSet
    val s2 = Sample.reservoirByGroup(corpus, "lang", "doc_id", 10, "seed-b")
      .as[(String, Long, Int)].collect().toSet
    assert(s1 == s1b, "replayable")
    assert(s1.map(t => (t._1, t._2)) != s2.map(t => (t._1, t._2)), "seed changes the draw")
  }
}
