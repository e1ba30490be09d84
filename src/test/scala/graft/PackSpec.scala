package graft

import org.apache.spark.sql.functions._
import graft.llm.Pack

class PackSpec extends SparkSpec {
  import spark.implicits._

  test("single bucket: exact greedy concatenate-then-chunk, straddlers split") {
    // token counts: 3, 3, 4 with seqLen 4 -> doc 10 fills [0,3), doc 11
    // spans [3,6) straddling the seq-0/1 boundary, doc 12 spans [6,10)
    // straddling seq-1/2.
    val docs = Seq(
      (10L, "a b c"),
      (11L, "d e f"),
      (12L, "g h i j")
    ).toDF("doc_id", "text")
    val out = Pack.sequences(docs, seqLen = 4, buckets = 1)
      .orderBy("seq", "doc_id", "tok_start")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 10L, 0L, 3L), // doc 10 fully in seq 0
      (0L, 11L, 0L, 1L), // doc 11 head fills seq 0
      (1L, 11L, 1L, 2L), // doc 11 tail opens seq 1
      (1L, 12L, 0L, 2L), // doc 12 head closes seq 1
      (2L, 12L, 2L, 2L)  // doc 12 tail opens seq 2
    ))
  }

  test("boundaries: within-seq offsets tile each sequence exactly, in doc order") {
    val docs = Seq(
      (10L, "a b c"), (11L, "d e f"), (12L, "g h i j")
    ).toDF("doc_id", "text")
    val out = Pack.boundaries(docs, seqLen = 4, buckets = 1)
      .orderBy("seq").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out.toSeq == Seq(
      (0L, 2L, 4L, "0:3:10,3:1:11"), // doc 10 then doc 11's head
      (1L, 2L, 4L, "0:2:11,2:2:12"), // doc 11's tail then doc 12's head
      (2L, 1L, 2L, "0:2:12")         // the ragged final window
    ), out.toSeq.toString)
    // tiling invariant on the real fixture: slices are contiguous from 0
    // and sum to n_tok within every sequence
    val fx = Pack.boundaries(Tables.documents(spark, "/root/testdata/sf0.001"),
      seqLen = 64, buckets = 4).collect()
    fx.foreach { r =>
      val parts = r.getString(4).split(",").map(_.split(":").map(_.toLong))
      var off = 0L
      parts.foreach { case Array(s, len, _) =>
        assert(s == off, s"gap at $off in ${r.getString(4)}"); off += len
      }
      assert(off == r.getLong(3), "boundary lens sum to the filled count")
      assert(parts.length == r.getLong(2).toInt)
    }
  }

  test("token mass is conserved and every sequence but the last is full") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Pack.sequences(docs, seqLen = 64, buckets = 4).cache()
    val totalPacked = out.agg(sum("tok_len")).collect().head.getLong(0)
    val totalTokens = docs
      .select(size(graft.llm.TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .agg(sum("n")).collect().head.getLong(0)
    assert(totalPacked == totalTokens, "no token lost or duplicated")
    val fills = out.groupBy("bucket", "seq").agg(sum("tok_len").as("fill"))
    val lastSeq = fills.groupBy("bucket").agg(max("seq").as("last"))
    val nonLast = fills.join(lastSeq, Seq("bucket")).filter(col("seq") < col("last"))
    assert(nonLast.filter(col("fill") =!= 64).count() == 0,
      "interior sequences are exactly seqLen tokens")
    out.unpersist()
  }

  test("payloads: pieces reassemble the exact token stream in pack order") {
    val docs = Seq(
      (10L, "a b c"),
      (11L, "d e f"),
      (12L, "g h i j")
    ).toDF("doc_id", "text")
    val out = Pack.payloads(docs, seqLen = 4, buckets = 1)
      .orderBy("seq").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out.toSeq == Seq(
      (0L, 2L, 4L, "a b c d"),  // doc 10 + head of doc 11
      (1L, 2L, 4L, "e f g h"),  // tail of 11 + head of 12
      (2L, 1L, 2L, "i j")       // tail of 12
    ))
  }

  test("property: random corpora — slices contiguous, per-doc mass exact, fills bounded") {
    val rnd = new scala.util.Random(42)
    val docs = (0L until 200L).map { i =>
      (i, Seq.fill(rnd.nextInt(30))("w" + rnd.nextInt(50)).mkString(" "))
    }.toDF("doc_id", "text")
    val rows = Pack.sequences(docs, seqLen = 8, buckets = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // per-doc: slices are contiguous from 0 across consecutive seqs
    rows.groupBy(_._3).foreach { case (doc, rs) =>
      val ordered = rs.sortBy(_._2)
      assert(ordered.head._4 == 0L, s"doc $doc first slice starts at 0")
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._4 == a._4 + a._5, s"doc $doc slices contiguous")
          assert(b._2 == a._2 + 1, s"doc $doc spans consecutive seqs")
        case _ =>
      }
    }
    // per-sequence: fill never exceeds seqLen
    rows.groupBy(r => (r._1, r._2)).foreach { case (k, rs) =>
      assert(rs.map(_._5).sum <= 8, s"seq $k fill <= seqLen")
    }
    // docs with zero tokens are absent; all others carry exact token mass
    val expected = docs.select(col("doc_id"),
        size(graft.llm.TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val packed = rows.groupBy(_._3).view.mapValues(_.map(_._5).sum).toMap
    expected.foreach { case (doc, n) =>
      assert(packed.getOrElse(doc, 0L) == n, s"doc $doc token mass")
    }
  }

  test("nosplit: whole docs only; overflow truncates at the bin tail") {
    // counts 3, 3, 4 with seqLen 4, one bucket:
    // doc 10 starts at 0 -> bin 0, pos 0, kept 3
    // doc 11 starts at 3 -> bin 0, pos 3, kept 1 (tail truncated)
    // doc 12 starts at 6 -> bin 1, pos 0, kept 4
    val docs = Seq(
      (10L, "a b c"), (11L, "d e f"), (12L, "g h i j")
    ).toDF("doc_id", "text")
    val out = Pack.nosplit(docs, seqLen = 4, buckets = 1)
      .orderBy("bin", "doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (0L, 10L, 3L, 0L, 3L),
      (0L, 11L, 3L, 3L, 1L),
      (1L, 12L, 4L, 0L, 4L)))
  }

  test("nosplit: kept_tok never exceeds bin capacity and never splits a doc across bins") {
    val docs = (1L to 60L).map(i =>
      (i, (1 to (i % 7 + 1).toInt).map(j => s"t${i}_$j").mkString(" "))).toDF("doc_id", "text")
    val out = Pack.nosplit(docs, seqLen = 8, buckets = 4).collect()
    // each doc appears exactly once (the defining no-split property)
    assert(out.map(_.getLong(2)).distinct.length == out.length)
    // per-bin kept mass fits capacity
    out.groupBy(r => (r.getLong(0), r.getLong(1))).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(5)).sum <= 8)
    }
    // kept tokens are a prefix: kept <= n_tok, and pos+kept <= seqLen
    out.foreach { r =>
      assert(r.getLong(5) <= r.getLong(3) && r.getLong(4) + r.getLong(5) <= 8)
    }
  }

  test("fillStats: fill + trunc account for every offered token") {
    val docs = (1L to 40L).map(i =>
      (i, (1 to (i % 5 + 2).toInt).map(j => s"x${i}_$j").mkString(" "))).toDF("doc_id", "text")
    val fills = Pack.fillStats(docs, seqLen = 8, buckets = 2).collect()
    val offered = fills.map(_.getLong(3)).sum
    val kept = fills.map(_.getLong(4)).sum
    val expected = (1L to 40L).map(i => i % 5 + 2).sum
    assert(offered == expected, "every token is offered to exactly one bin")
    assert(kept <= offered)
    fills.foreach { r =>
      assert(r.getLong(5) == r.getLong(4) * 1000000L / 8L)
      assert(r.getLong(6) == (r.getLong(3) - r.getLong(4)) * 1000000L / 8L)
    }
  }

  test("sweep: hand-computed truncation and padding costs per config") {
    // counts 3, 3, 4 with one bucket (btok = 10):
    // L=4: bins (0:[d10 k3, d11 k1], 1:[d12 k4]) -> kept 8, trunc 2;
    //      split ceil(10/4)=3 seqs, pad 2
    // L=8: one bin [d10 k3, d11 k3, d12 k2] -> kept 8, trunc 2;
    //      split ceil(10/8)=2 seqs, pad 6
    val docs = Seq(
      (10L, "a b c"), (11L, "d e f"), (12L, "g h i j")
    ).toDF("doc_id", "text")
    val out = Pack.sweep(docs, seqLens = Seq(4, 8), buckets = 1)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(out.toSeq == Seq(
      (4, 2L, 10L, 8L, 0L, 200000L, 3L, 2L * 1000000L / 12L),
      (8, 1L, 10L, 8L, 0L, 200000L, 2L, 6L * 1000000L / 16L)))
  }

  test("sweep: each config row matches the fillStats rollup at that config") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    for (l <- Seq(64, 256)) {
      val row = Pack.sweep(docs, seqLens = Seq(l), buckets = 4).collect().head
      val fills = Pack.fillStats(docs, seqLen = l, buckets = 4)
        .agg(count(lit(1)).as("n_bins"), sum("tok_offered").as("off"),
          sum("tok_kept").as("kept")).collect().head
      assert(row.getAs[Long]("n_bins") == fills.getAs[Long]("n_bins"), s"L=$l bins")
      assert(row.getAs[Long]("tok_offered") == fills.getAs[Long]("off"), s"L=$l offered")
      assert(row.getAs[Long]("tok_kept") == fills.getAs[Long]("kept"), s"L=$l kept")
    }
  }

  test("sweep: offered mass is config-invariant; split capacity covers every token") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = Pack.sweep(docs, buckets = 4).collect()
    assert(rows.length == Pack.SweepLens.length)
    val offered = rows.map(_.getAs[Long]("tok_offered")).distinct
    assert(offered.length == 1, "every config sees the same corpus")
    rows.foreach { r =>
      val l = r.getAs[Int]("seq_len").toLong
      assert(r.getAs[Long]("tok_kept") <= r.getAs[Long]("tok_offered"))
      assert(r.getAs[Long]("split_seqs") * l >= r.getAs[Long]("tok_offered"),
        "split-style capacity >= corpus tokens (lossless by construction)")
      assert(r.getAs[Long]("trunc_ppm") >= 0L && r.getAs[Long]("split_pad_ppm") >= 0L)
      assert(r.getAs[Long]("split_pad_ppm") < 1000000L, "padding is less than capacity")
    }
  }

  test("bucketing is deterministic and partition-independent") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = Pack.sequences(docs).collect().map(_.toSeq).toSet
    val b = Pack.sequences(docs.repartition(13)).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("autoBuckets scales with the corpus, floors at Buckets, mirrors the SQL twin") {
    assert(Pack.autoBuckets(0L) == Pack.Buckets)
    assert(Pack.autoBuckets(500L) == Pack.Buckets, "fixture scales stay at the floor")
    assert(Pack.autoBuckets(Pack.DocsPerBucket * Pack.Buckets) == Pack.Buckets)
    assert(Pack.autoBuckets(Pack.DocsPerBucket * Pack.Buckets + 1) == Pack.Buckets + 1)
    assert(Pack.autoBuckets(500000L) == 123, "100x replica count")
    // ceil semantics match the SQL twin's (n + D-1) // D
    for (n <- Seq(1L, 4095L, 4096L, 4097L, 123456L))
      assert(Pack.autoBuckets(n) ==
        math.max(Pack.Buckets, ((n + Pack.DocsPerBucket - 1) / Pack.DocsPerBucket)).toInt)
  }
}
