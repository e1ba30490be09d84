package graft

import org.apache.spark.sql.functions._
import graft.llm.Weighting

/** Round-11 curation additions: soft dedup weights, per-epoch Poisson
  * sampling, char entropy, tokenizer compression, URL blocklist,
  * embedding-norm hygiene.
  */
class WeightingSpec extends SparkSpec {
  import spark.implicits._
  private val d = "/root/testdata/sf0.001"

  test("softDedup: weights are 1e6 div group size and the corpus mass is conserved per group") {
    val docs = Seq((1L, "same text"), (2L, "same  TEXT"), (3L, "unique one"))
      .toDF("doc_id", "text")
    val r = Weighting.softDedup(docs).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    // normText lowercases + collapses whitespace: docs 1,2 are one group
    assert(r == Seq((1L, 2L, 500000L), (2L, 2L, 500000L), (3L, 1L, 1000000L)), r)
  }

  test("poissonEpochs: mask agrees with n_epochs_kept and epochs differ") {
    val out = Weighting.poissonEpochs(Tables.documents(spark, d)).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val (kept, mask) = (r.getLong(1), r.getLong(2))
      assert(java.lang.Long.bitCount(mask) == kept, s"mask/count: $r")
      assert(mask < 16, s"mask within 4 epochs: $r")
    }
    // epoch samples must not be identical (independent hashes): some doc
    // kept in epoch 1 but not epoch 2 and vice versa
    val m = out.map(_.getLong(2))
    assert(m.exists(x => (x & 1) == 1 && (x & 2) == 0) &&
           m.exists(x => (x & 1) == 0 && (x & 2) == 2),
      "epoch subsets must differ")
    // aggregate keep rate near 60% per epoch (binomial tolerance at n=500)
    val rate1 = m.count(x => (x & 1) == 1).toDouble / m.length
    assert(rate1 > 0.5 && rate1 < 0.7, s"epoch-1 rate: $rate1")
  }

  test("char entropy: single-char runs score 0 bits; distinct chars score log2(n) floor") {
    val docs = Seq((1L, "aaaaaaaa"), (2L, "abcdefgh"), (3L, ""))
      .toDF("doc_id", "text")
    val r = graft.llm.Surprisal.perDocChars(docs).collect()
      .map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2))).toSeq
    // doc1: n=8, one char type c=8 -> width(8 div 8)-1 = 0 bits
    // doc2: n=8, c=1 each -> width(8)-1 = 3 bits per char -> mean 3e6 micro
    // doc3: empty -> 0 chars, NULL score
    assert(r == Seq((1L, 8L, 0L), (2L, 8L, 3000000L), (3L, 0L, -1L)), r)
  }

  test("tokenizer_compression: ppm ratios agree with per-source recomputation") {
    val out = SparkEntry.queries("tokenizer_compression")(spark, d).collect()
    assert(out.length == 20) // src0..src19
    out.foreach { r =>
      val (chars, toks, subs) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(r.getLong(5) == (if (toks == 0) 0L else chars * 1000000L / toks))
      assert(r.getLong(6) == (if (subs == 0) 0L else chars * 1000000L / subs))
      assert(r.getLong(7) == (if (toks == 0) 0L else subs * 1000000L / toks))
      assert(subs >= toks, "subtokens refine tokens")
    }
  }

  test("quality_url_blocklist: blocked hosts flagged, keep is the complement") {
    val out = SparkEntry.queries("quality_url_blocklist")(spark, d).collect()
    assert(out.length == 500)
    val blocked = out.filter(_.getBoolean(2))
    assert(blocked.nonEmpty, "blocklist hosts exist in the synthetic URL space")
    out.foreach { r =>
      assert(r.getBoolean(4) == !r.getBoolean(2), s"keep = !host_blocked: $r")
    }
    assert(out.exists(_.getBoolean(3)) && out.exists(!_.getBoolean(3)),
      "tracking flag exercises both verdicts")
  }

  test("embedding_norm_outliers: flags respect the 4x bands around the corpus mean") {
    val out = SparkEntry.queries("embedding_norm_outliers")(spark, d).collect()
    assert(out.length == 500)
    val mean = out.map(_.getLong(1)).sum / out.length
    out.foreach { r =>
      val (n2, flag) = (r.getLong(1), r.getString(2))
      val expect = if (n2 * 4 < mean) "low" else if (n2 > mean * 4) "high" else "ok"
      assert(flag == expect, s"flag: $r mean=$mean")
    }
  }
}
