package graft

import org.apache.spark.sql.functions._
import graft.llm.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merges: hand-traced 3-round training on a tiny corpus") {
    // vocab: 'aaab'×2, 'ab'×1
    // r1 pairs: (a a)=4, (a b)=3          -> merge 'a a'  => 'aa a b', 'a b'
    // r2 pairs: (aa a)=2, (a b)=3         -> merge 'a b'  => 'aa ab', 'ab'
    // r3 pairs: (aa ab)=2                 -> merge 'aa ab'
    val docs = Seq((0L, "aaab aaab ab")).toDF("doc_id", "text")
    val out = Bpe.merges(docs, k = 3)
      .as[(Int, String, Long)].collect().toSeq
    assert(out == Seq((1, "a a", 4L), (2, "a b", 3L), (3, "aa ab", 2L)), out.toString)
  }

  test("merges: pair frequency is non-increasing across rounds (greedy argmax)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val freqs = Bpe.merges(docs, k = 5)
      .orderBy("rank").select("pair_freq").as[Long].collect()
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b }, freqs.mkString(","))
  }

  test("applyTokenizer: token counts track the merge depth") {
    val docs = Seq((0L, "aaab aaab ab"), (1L, "")).toDF("doc_id", "text")
    // k=2: 'aaab' -> 'aa ab' (2 symbols), 'ab' -> 'ab' (1) => 2+2+1 = 5
    val k2 = Bpe.applyTokenizer(docs, k = 2).orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(k2 == Seq((0L, 3L, 5L), (1L, 0L, 0L)), k2.toString)
    // k=3: the 'aa ab' merge collapses 'aaab' to one symbol => 1+1+1 = 3
    val k3 = Bpe.applyTokenizer(docs, k = 3).orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(k3 == Seq((0L, 3L, 3L), (1L, 0L, 0L)), k3.toString)
  }

  test("fertility: exact integer ppm of pieces per word; empty docs read 0") {
    val docs = Seq((0L, "aaab aaab ab"), (1L, "")).toDF("doc_id", "text")
    // k=2: 3 words -> 5 pieces => 5_000_000 div 3 = 1_666_666 ppm
    val got = Bpe.fertility(docs, k = 2).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 3L, 5L, 1666666L), (1L, 0L, 0L, 0L)), got.toString)
  }

  test("fertilitySweep: char baseline at k=0, non-increasing in k, constant word mass") {
    val docs = Seq((0L, "aaab aaab ab"), (1L, "ab ab")).toDF("doc_id", "text")
    // 5 words, 14 chars -> k=0 fertility = 14e6 div 5 = 2_800_000 ppm
    val rows = Bpe.fertilitySweep(docs, Seq(0, 1, 2, 3))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) == Seq(0L, 1L, 2L, 3L), "one row per requested k")
    assert(rows.forall(_._2 == 5L), "merges never change word count")
    assert(rows.head == ((0L, 5L, 14L, 2800000L)), rows.head.toString)
    val ferts = rows.map(_._4)
    assert(ferts.zip(ferts.tail).forall { case (a, b) => a >= b },
      s"fertility must not increase with merges: $ferts")
    // k=2 totals agree with applyTokenizer's corpus sum (2+2+1 per 'aaab
    // aaab ab' + 1+1 for 'ab ab' = 7 pieces)
    assert(rows(2)._3 == 7L, rows(2).toString)
  }

  test("vocab: symbol segmentation is lossless (spaces removed == word)") {
    val docs = Seq((0L, "hello world hello")).toDF("doc_id", "text")
    val v = Bpe.vocab(docs)
      .select(regexp_replace(col("w"), " ", "").as("word"), col("freq"))
      .as[(String, Long)].collect().toMap
    assert(v == Map("hello" -> 2L, "world" -> 1L), v.toString)
  }

  test("fertilitySweep: merge exhaustion freezes the vocab (advice r8)") {
    // 'ab' and 'cd' exhaust after 2 merges; rounds 3..6 must reuse the
    // final segmentation instead of wiping the vocab to NULL totals
    val docs = Seq((0L, "ab cd"), (1L, "ab")).toDF("doc_id", "text")
    val rows = Bpe.fertilitySweep(docs, Seq(0, 2, 4, 6))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) == Seq(0L, 2L, 4L, 6L), rows.toString)
    assert(rows.forall(_._2 == 3L), s"word mass constant, no NULLs: $rows")
    // post-exhaustion rows repeat the k=2 totals (3 words -> 3 symbols)
    assert(rows.drop(1).forall(r => r._3 == 3L && r._4 == 1000000L), rows.toString)
    // the merge table simply stops growing
    assert(Bpe.merges(docs, k = 6).count() == 2L)
  }
}
