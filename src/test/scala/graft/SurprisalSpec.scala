package graft

import org.apache.spark.sql.functions._
import graft.llm.{Diversity, Surprisal}

/** llm.Surprisal + Diversity.hapax on a hand-computed corpus. */
class SurprisalSpec extends SparkSpec {
  import spark.implicits._

  // vocab over the 3 docs: a→3, b→1, c→1; N = 5
  private def corpus = Seq(
    (1L, "a a b", "en", "s1", 5L),
    (2L, "a c", "en", "s1", 3L),
    (3L, "", "en", "s1", 0L)).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("whole-bit surprisal: bits = width(N DIV f) - 1, mean in micro-bits") {
    val got = Surprisal.perDoc(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    // a: 5 DIV 3 = 1 → 0 bits; b, c: 5 → '101' → 2 bits
    // doc1: (0+0+2)·1e6 DIV 3 = 666666; doc2: (0+2)·1e6 DIV 2 = 1000000
    assert(got.toSeq == Seq((1L, 3L, 666666L), (2L, 2L, 1000000L), (3L, 0L, -1L)))
  }

  test("bigram surprisal: bits = width(f1 DIV f2) - 1 over word pairs") {
    // bigrams: doc1 "a a","a b"; doc2 "a c". f2: each 1. f1(a) = 3.
    // bits = width(3 DIV 1) - 1 = 1 for all three bigrams.
    // doc1: 2 bigrams, 2 bits → 1e6; doc2: 1 bigram, 1 bit → 1e6;
    // doc3 (empty): 0 bigrams, NULL.
    val got = Surprisal.perDocBigram(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 1000000L), (2L, 1L, 1000000L), (3L, 0L, -1L)))
  }

  test("hapax spectrum + Good-Turing unseen mass") {
    val r = Diversity.hapax(corpus).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) ==
      ((3L, 5L, 2L, 0L, 666666L, 400000L)),
      s"types/tokens/hapax/dis/type_ppm/gt_ppm: $r")
  }

  test("empty corpus: zero rows of tokens, guarded ppm = 0") {
    val empty = corpus.filter(col("doc_id") > 99)
    val r = Diversity.hapax(empty).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(4), r.getLong(5)) ==
      ((0L, 0L, 0L, 0L)))
  }
}
