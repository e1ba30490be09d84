package graft

import graft.llm.Divergence

/** Distribution diagnostics: pairwise TV distance and source attribution. */
class DivergenceSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  test("pairwiseTV: identical distributions are 0; disjoint vocabularies are 1e6") {
    val df = docsDf(Seq(
      (1L, "a", "x y z"), (2L, "b", "x y z"),   // identical
      (3L, "c", "p q r")))                       // disjoint from both
    val tv = Divergence.pairwiseTV(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(5)).toMap
    assert(tv(("a", "b")) == 0L)
    assert(tv(("a", "c")) == 1000000L && tv(("b", "c")) == 1000000L)
  }

  test("pairwiseTV: hand-computed half-overlap case, shared_vocab exact") {
    // P = {x: 1/2, y: 1/2}, Q = {x: 1/2, z: 1/2}
    // TV = 1/2 (|1/2-1/2| + |1/2-0| + |0-1/2|) = 1/2
    val df = docsDf(Seq((1L, "a", "x y"), (2L, "b", "x z")))
    val r = Divergence.pairwiseTV(df).collect().head
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getLong(2) == 2L && r.getLong(3) == 2L) // n1, n2
    assert(r.getLong(4) == 1L)                       // shared vocab: x
    assert(r.getLong(5) == 500000L)
  }

  test("pairwiseTV emits each unordered pair once, s1 < s2") {
    val df = docsDf(Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z")))
    val pairs = Divergence.pairwiseTV(df).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(pairs.length == 3 && pairs.forall { case (x, y) => x < y })
    assert(pairs.toSet == Set(("a", "b"), ("a", "c"), ("b", "c")))
  }

  test("sourceClassifier: pure-vocabulary docs attribute to their own source") {
    val df = docsDf(Seq(
      (1L, "a", "alpha alpha beta"), (2L, "a", "alpha beta beta"),
      (3L, "b", "gamma delta gamma"), (4L, "b", "delta gamma delta")))
    val out = Divergence.sourceClassifier(df).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(1L -> "a", 2L -> "a", 3L -> "b", 4L -> "b"))
  }

  test("sourceClassifier: a mislabeled doc surfaces off-diagonal") {
    val df = docsDf(Seq(
      (1L, "a", "alpha beta alpha beta"),
      (2L, "a", "beta alpha alpha beta"),
      (3L, "b", "gamma delta delta gamma"),
      (4L, "b", "alpha beta alpha beta")))  // b-labeled, a-flavored
    val out = Divergence.sourceClassifier(df).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(out(4L) == (("b", "a")), "token mix wins over the label")
    assert(out(1L)._2 == "a" && out(3L)._2 == "b")
  }

  test("sourceClassifier: deterministic tie-break takes the lexicographically first source") {
    // Two sources with mirrored counts: every doc scores equally against
    // both -> pred must be the smaller source name, never shuffle-order.
    val df = docsDf(Seq((1L, "b", "x y"), (2L, "a", "x y")))
    val out = Divergence.sourceClassifier(df).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) == "a" && out(2L) == "a")
  }
}
