package graft

import org.apache.spark.sql.functions._
import graft.llm.Scrub

class ScrubSpec extends SparkSpec {
  import spark.implicits._

  test("repetition: all-same tokens max out top2; unique tokens score zero") {
    val docs = Seq(
      (1L, "a a a a"),            // 2-grams: "a a" ×3; 3-grams: "a a a" ×2
      (2L, "v w x y z"),          // all grams distinct
      (3L, "q")                   // too short for any gram
    ).toDF("doc_id", "text")
    val out = Scrub.repetitionByKey(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((3L, 1.0, 0.5)), "3 identical 2-grams; 2 3-grams, 1 distinct")
    assert(out(2L)._2 == 0.25 && out(2L)._3 == 0.0, "4 distinct 2-grams, top freq 1/4")
    assert(out(3L) == ((0L, 0.0, 0.0)), "short doc kept with zero fractions")
  }

  test("redaction: emails and phones replaced, counts match") {
    val df = Seq(
      "mail me at sam.o'x@nope and real.user+tag@sub.example.org or +1-555-1234",
      "no pii here at all"
    ).toDF("text")
      .select(Scrub.redact(col("text")).as("red"),
        Scrub.emailCount(col("text")).as("ne"),
        Scrub.phoneCount(col("text")).as("np"))
    val rows = df.collect()
    assert(rows(0).getString(0) == "mail me at sam.o'x@nope and <EMAIL> or <PHONE>",
      "valid email + phone replaced; the @nope non-domain is left alone")
    assert(rows(0).getInt(1) == 1 && rows(0).getInt(2) == 1)
    assert(rows(1).getString(0) == "no pii here at all")
    assert(rows(1).getInt(1) == 0 && rows(1).getInt(2) == 0)
  }

  test("redaction: uppercase emails, 3-3-4 phones; ISO dates untouched") {
    val df = Seq(
      "Reach John.Doe@Example.COM or 415-555-2671 after 2024-01-01 10:05:00"
    ).toDF("text")
      .select(Scrub.redact(col("text")).as("red"),
        Scrub.emailCount(col("text")).as("ne"),
        Scrub.phoneCount(col("text")).as("np"))
    val r = df.collect().head
    assert(r.getString(0) == "Reach <EMAIL> or <PHONE> after 2024-01-01 10:05:00",
      s"case-insensitive email + undashed-prefix phone redacted, date kept: ${r.getString(0)}")
    assert(r.getInt(1) == 1 && r.getInt(2) == 1)
  }

  test("cleanCorpus top2_frac_r == repetitionByKey's n=2 slice") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), Scrub.redact(col("text")).as("rtext"))
    val viaClean = Scrub.cleanCorpus(
        Tables.documents(spark, "/root/testdata/sf0.001"), 0.4, 0.6)
      .select("doc_id", "top2_frac_r")
    val viaRep = Scrub.repetitionByKey(docs, "doc_id", "rtext")
      .select("doc_id", "top2_frac_r")
    assert(viaClean.exceptAll(viaRep).isEmpty && viaRep.exceptAll(viaClean).isEmpty,
      "the 2-gram-only gate is bitwise the full operator's n=2 slice")
  }

  test("cleanCorpus: each gate independently fails the right document") {
    val good = "the quick brown fox and a lazy dog walk to the busy market in town square today"
    val docs = Seq(
      (0L, good),                                     // admitted
      (1L, good),                                     // exact dup of 0 -> keeper lost
      (2L, "spam spam spam spam spam spam spam spam") // repetitive -> top2 gate
    ).toDF("doc_id", "text")
    val out = Scrub.cleanCorpus(docs, minQuality = 0.4, maxTop2 = 0.6)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(3), r.getBoolean(4)))
    assert(out.toSeq == Seq((0L, true, true), (1L, false, false), (2L, true, false)),
      s"keeper/dup/repetition verdicts: ${out.toSeq}")
  }

  test("stratified sampling: deterministic, rate-proportional, stratum-routed") {
    val rows = (0L until 2000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
    val df = rows.toDF("doc_id", "lang")
    val keep = Scrub.stratifiedKeep(col("doc_id"), col("lang"),
      Seq("en" -> 500000L), 100000L, "spec-seed")
    val kept = df.filter(keep).collect().map(r => (r.getLong(0), r.getString(1)))
    val keptAgain = df.filter(keep).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.toSeq == keptAgain.toSeq, "same seed -> identical slice")
    val enFrac = kept.count(_._2 == "en") / 1000.0
    val deFrac = kept.count(_._2 == "de") / 1000.0
    assert(enFrac > 0.42 && enFrac < 0.58, s"en ~50%, got $enFrac")
    assert(deFrac > 0.05 && deFrac < 0.16, s"unknown stratum takes default ~10%, got $deFrac")
  }

  test("mixing loop: mix_apply lands downsampled languages near mix_rates' token target") {
    val d = "/root/testdata/sf0.001"
    val rates = SparkEntry.queries("mix_rates")(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap // lang -> (target, ppm)
    val applied = SparkEntry.queries("mix_apply")(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap // lang -> (kept, keptTok)
    assert(rates.keySet == applied.keySet && rates.nonEmpty)
    val down = rates.filter(_._2._2 < 1000000L)
    assert(down.nonEmpty, "the fixture must have at least one over-represented language")
    down.foreach { case (lang, (target, _)) =>
      val keptTok = applied(lang)._2.toDouble
      assert(math.abs(keptTok - target) / target < 0.25,
        s"$lang kept $keptTok tokens vs target $target — hash gate off its rate")
    }
    // full-rate languages keep everything
    rates.filter(_._2._2 == 1000000L).foreach { case (lang, _) =>
      val (kept, _) = applied(lang)
      val total = SparkEntry.queries("mix_apply")(spark, d)
        .filter(col("lang") === lang).collect().head.getLong(1)
      assert(kept == total, s"$lang under target must keep all docs")
    }
  }

  test("contamination: benchmark copy flagged fully, unrelated doc clean") {
    val docs = Seq(
      (0L, "one two three four five six seven"),  // benchmark (id % 2 == 0... use pred below)
      (1L, "one two three four five six seven"),  // exact copy -> all shingles hit
      (3L, "apple banana cherry date elderberry fig grape"), // disjoint -> clean
      (5L, "tiny")                                 // too short -> zero shingles, clean
    ).toDF("doc_id", "text")
    val out = Scrub.contamination(docs, col("doc_id") === 0L, shingleSize = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out(1L) == ((3L, 3L, 1.0, true)), "7 tokens -> 3 5-gram shingles, all contaminated")
    assert(out(3L) == ((3L, 0L, 0.0, false)))
    assert(out(5L) == ((0L, 0L, 0.0, false)), "short doc kept with zero counts")
    assert(!out.contains(0L), "benchmark docs are not scored")
  }
}
