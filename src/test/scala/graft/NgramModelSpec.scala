package graft

import org.apache.spark.sql.functions._
import graft.llm.NgramModel

class NgramModelSpec extends SparkSpec {
  import spark.implicits._

  // doc 0 and 1 share the 5-gram "a b c d e" (and "b c d e f"); doc 2 is
  // unique; doc 3 is too short for any 5-gram; doc 4 is empty.
  private def corpus = Seq(
    (0L, "a b c d e f"),
    (1L, "a b c d e f"),
    (2L, "p q r s t u v"),
    (3L, "x y"),
    (4L, "")
  ).toDF("doc_id", "text")

  test("boilerplateFlag: shared shingles flagged, short/empty docs kept with 0") {
    val out = NgramModel.boilerplateFlag(corpus, n = 5, minDf = 2L, maxPpm = 300000L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    // docs 0/1: 2 shingles each, both boilerplate (df=2) -> 1_000_000 ppm, dropped
    assert(out(0) == ((0L, 2L, 2L, 1000000L, false)))
    assert(out(1) == ((1L, 2L, 2L, 1000000L, false)))
    // doc 2: 3 shingles, none shared -> kept
    assert(out(2) == ((2L, 3L, 0L, 0L, true)))
    // doc 3 (too short) and doc 4 (empty): zero shingles, kept
    assert(out(3) == ((3L, 0L, 0L, 0L, true)))
    assert(out(4) == ((4L, 0L, 0L, 0L, true)))
  }

  test("boilerplateFlag: partial exposure lands between the extremes") {
    val mixed = Seq(
      (0L, "a b c d e"),          // the shared shingle
      (1L, "a b c d e z1 z2 z3"), // shares 1 of 4 shingles -> 250000 ppm
      (2L, "m n o p q")
    ).toDF("doc_id", "text")
    val out = NgramModel.boilerplateFlag(mixed, n = 5, minDf = 2L, maxPpm = 300000L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(out(1) == ((1L, 4L, 1L, 250000L, true)))
  }

  test("lmScore: hand-computed add-one bigram terms") {
    // corpus: "a b", "a b", "a c" -> bigrams: (a b):2, (a c):1; c1(a)=3; V=3
    // doc 0/1 term: (2+1)*1e6 div (3+3) = 500000; doc 2: (1+1)*1e6 div 6 = 333333
    val tiny = Seq((0L, "a b"), (1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = NgramModel.lmScore(tiny).orderBy("doc_id")
      .as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((0L, 1L, 500000L), (1L, 1L, 500000L), (2L, 1L, 333333L)))
  }

  test("lmScore: docs without bigrams emit zeros, not missing rows") {
    val tiny = Seq((0L, "a b"), (1L, "solo"), (2L, "")).toDF("doc_id", "text")
    val out = NgramModel.lmScore(tiny).orderBy("doc_id")
      .as[(Long, Long, Long)].collect()
    assert(out.length == 3 && out(1) == ((1L, 0L, 0L)) && out(2) == ((2L, 0L, 0L)))
  }

  test("lmScore ranks corpus-typical docs above atypical ones on the fixture") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = NgramModel.lmScore(docs)
    // every scored doc gets a positive score; add-one smoothing caps at 1e6
    val bad = out.filter(col("n_bigrams") > 0 &&
      (col("lm_ppm") <= 0 || col("lm_ppm") > 1000000L)).count()
    assert(bad == 0)
  }
}
