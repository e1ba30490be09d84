package graft

import graft.llm.Winnow

/** Winnowing fingerprints: MOSS selection guarantee, density, edge cases,
  * and an INDEPENDENT plain-Scala replay of the window-min selection
  * (loops over locally recomputed hashes — no Spark expressions), so the
  * engine's posexplode + sliding-window-min plan is checked against the
  * published algorithm, not against itself.
  */
class WinnowSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def words(range: Range, p: String = "w") = range.map(i => s"$p$i").mkString(" ")

  /** Local (non-Spark) replay: tokenHashes → hashedShingles → winnow set. */
  private def localWinnow(text: String, k: Int, w: Int): Set[Long] = {
    import graft.expr.PortableHash.phashLocal
    val toks = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val th = toks.map(phashLocal)
    if (th.length < k) return Set.empty
    val cs = graft.llm.Dedup.comboConstants(k)
    val P = graft.llm.Dedup.MinhashPrime
    val sh = (0 to th.length - k).map { i =>
      val s = cs.zipWithIndex.map { case (c, j) => c * th(i + j) }.sum + th(i + k - 1)
      ((s % P) + P) % P
    }
    if (sh.length < w) Set(sh.min)
    else (0 to sh.length - w).map(i => sh.slice(i, i + w).min).toSet
  }

  test("engine fingerprint set equals the independent local winnow replay") {
    val texts = Seq(
      1L -> words(1 to 30),
      2L -> (words(1 to 6, "a") + " " + words(1 to 12) + " " + words(1 to 6, "z")),
      3L -> words(1 to 7, "q"))
    val got = Winnow.fingerprints(docsDf(texts)).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(_.getLong(2)).toSet }
    texts.foreach { case (id, t) =>
      assert(got(id) == localWinnow(t, Winnow.K, Winnow.W), s"doc $id")
    }
  }

  test("MOSS guarantee: a shared run of w+k-1 tokens yields a shared fingerprint") {
    // guarantee threshold = W + K - 1 = 7 tokens; embed the same 7-token
    // run in two otherwise-disjoint docs at different offsets
    val run = words(1 to 7, "s")
    val df = docsDf(Seq(
      (1L, words(1 to 9, "a") + " " + run + " " + words(1 to 5, "b")),
      (2L, words(1 to 3, "x") + " " + run + " " + words(1 to 11, "y"))))
    val fp = Winnow.fingerprints(df).collect()
      .groupBy(_.getLong(0)).map { case (id, r) => id -> r.map(_.getLong(2)).toSet }
    assert((fp(1L) & fp(2L)).nonEmpty, "shared >= w+k-1 run must share a fingerprint")
  }

  test("edges: <k tokens absent; k<=tokens<k+w-1 selects exactly one") {
    val df = docsDf(Seq(
      (1L, words(1 to 3)),  // 3 < K=4 tokens: no k-grams at all
      (2L, words(1 to 5)))) // 2 k-grams < W: one clipped window
    val st = Winnow.docStats(df).collect()
    assert(!st.exists(_.getLong(0) == 1L))
    val d2 = st.find(_.getLong(0) == 2L).get
    assert(d2.getLong(1) == 2L && d2.getLong(2) == 1L) // n_kgrams=2, n_fp=1
  }

  test("density: 1 <= n_fp <= n_kgrams, and near 2/(w+1) on long random-ish text") {
    val df = docsDf(Seq((1L, words(1 to 400))))
    val r = Winnow.docStats(df).collect().head
    val (nk, nf) = (r.getLong(1), r.getLong(2))
    assert(nf >= 1 && nf <= nk)
    // expected density 2/(W+1) = 0.4; allow wide slack for hash luck
    assert(nf.toDouble / nk > 0.15 && nf.toDouble / nk < 0.75)
  }

  test("overlap: df cap excludes boilerplate; containment over the smaller doc") {
    val shared = words(1 to 12, "s")
    val df = docsDf(Seq(
      (1L, shared + " " + words(1 to 20, "a")),
      (2L, shared + " " + words(1 to 4, "b")),
      (3L, words(1 to 24, "c"))))
    val ov = Winnow.overlap(df, minShared = 1).collect()
    assert(ov.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    val row = ov.head
    // containment denominator is the SMALLER (doc 2) kept set
    val stats = Winnow.docStats(df).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(row.getLong(3) == row.getLong(2) * 1000000L / math.min(stats(1L), stats(2L)))
    // a df cap of 1 kills every cross-doc fingerprint -> no pairs
    assert(Winnow.overlap(df, maxDf = 1, minShared = 1).count() == 0L)
  }

  test("incremental: batch probes the frozen index only; containment over the batch doc") {
    import org.apache.spark.sql.functions.col
    val run = words(1 to 12, "s")
    val df = docsDf(Seq(
      (0L, run + " " + words(1 to 10, "a")),   // index: owns the run
      (1L, words(1 to 20, "b")),               // index: unrelated
      (9L, run + " " + words(1 to 4, "x")),    // batch: quotes the run
      (19L, run + " " + words(1 to 4, "x"))))  // batch: near-dup OF DOC 9
    val inc = Winnow.incremental(df, col("doc_id") >= 9, minShared = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // both batch docs hit index doc 0; batch-batch pairs (9,19) NEVER appear
    assert(inc.map(t => (t._1, t._2)).toSet == Set((9L, 0L), (19L, 0L)), inc.toSeq.toString)
    // identical batch docs get identical verdicts (batch-composition-free)
    val v9 = inc.filter(_._1 == 9L).map(t => (t._3, t._4)).toSet
    val v19 = inc.filter(_._1 == 19L).map(t => (t._3, t._4)).toSet
    assert(v9 == v19)
    // containment denominator is the batch doc's own fingerprint count
    val nb = Winnow.fingerprints(df).filter(col("doc_id") === 9L).count()
    assert(inc.find(_._1 == 9L).get._4 == inc.find(_._1 == 9L).get._3 * 1000000L / nb)
  }

  test("rowwise (streaming-legal) fingerprints == window-min fingerprints") {
    val df = docsDf(Seq(
      (1L, words(1 to 40)),
      (2L, words(1 to 5)),                                  // n_kgrams < W
      (3L, words(1 to 3)),                                  // < K tokens: absent
      (4L, words(1 to 8, "p") + " " + words(1 to 8, "p")))) // internal repeat
    def collect(f: org.apache.spark.sql.DataFrame) =
      f.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(collect(Winnow.fingerprintsRowwise(df)) == collect(Winnow.fingerprints(df)))
  }

  test("streaming winnowProbe == batch overlap join over the same static index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, count, lit}
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val run = words(1 to 7, "s") // exactly the w+k-1 guarantee threshold
    val index = docsDf(Seq(
      (0L, words(1 to 10, "a") + " " + run),
      (1L, words(1 to 16, "b"))))
    val incoming = Seq(
      (9L, run + " " + words(1 to 9, "x")), // shares the run with doc 0
      (19L, words(1 to 12, "n")),           // novel
      (29L, "one two"))                     // below k-gram width
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.DocStream.winnowProbe(
        in.toDF().toDF("doc_id", "text"), index)
      .writeStream.format("memory").queryName("winnow_probe").outputMode("append").start()
    try {
      in.addData(incoming.take(1): _*); q.processAllAvailable()
      in.addData(incoming.drop(1): _*); q.processAllAvailable()
      val streamed = spark.table("winnow_probe").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // batch replica: rowwise fingerprints against the df-capped index
      val fp = Winnow.fingerprints(index).select("doc_id", "fp")
      val dfq = fp.groupBy("fp").agg(count(lit(1)).as("df"))
      val idx = fp.join(dfq.filter(col("df") <= Winnow.MaxDf), "fp")
        .select(col("fp"), col("doc_id").as("near_id"))
      val expected = Winnow.fingerprintsRowwise(incoming.toDF("doc_id", "text"))
        .join(idx, Seq("fp"))
        .select(col("doc_id"), col("near_id"), col("fp"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == expected, s"streamed $streamed != batch $expected")
      // MOSS guarantee across the stream boundary: the planted run hits doc 0
      assert(streamed.exists(t => t._1 == 9L && t._2 == 0L))
      assert(!streamed.exists(_._1 == 19L) && !streamed.exists(_._1 == 29L))
    } finally q.stop()
  }

  test("contamination: a planted >= w+k-1 benchmark span is caught; clean docs read 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def uniq(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val benchSpan = uniq("bench", 8) // >= w+k-1 = 7 tokens: guaranteed hit
    val docs = Seq(
      (0L, benchSpan + " " + uniq("bq", 12)),   // the benchmark doc (id % 50 == 0)
      (1L, uniq("clean", 20)),                  // clean corpus doc
      (2L, benchSpan + " " + uniq("cx", 12)),   // contaminated corpus doc
      (50L, uniq("btwo", 20)))                  // second benchmark doc
      .toDF("doc_id", "text")
    val got = Winnow.contamination(docs, pmod(col("doc_id"), lit(50)) === 0)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(!got.contains(0L) && !got.contains(50L), "benchmark docs are not scored")
    assert(got(1L)._2 == 0L && got(1L)._3 == 0L, s"clean doc: ${got(1L)}")
    val (nfp, nhit, ppm) = got(2L)
    assert(nhit >= 1L, s"planted span must hit: ${got(2L)}")
    assert(ppm == nhit * 1000000L / nfp, s"exact ppm: ${got(2L)}")
  }
}
