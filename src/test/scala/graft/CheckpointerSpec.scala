package graft

import org.apache.spark.sql.functions._
import graft.ops.{Checkpointer, GlobalRank, PageRank}
import graft.llm.Dedup

/** The reliable-checkpoint seam: every operator that cuts lineage must
  * produce IDENTICAL results whether the cut is executor-local blocks
  * (default) or a reliable HDFS-style checkpoint — durability is a
  * deployment knob, never semantics.
  */
class CheckpointerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val checkpointDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_reliable_cp").toString
    spark.sparkContext.setCheckpointDir(dir)
    dir
  }

  private def collectSorted(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("Reliable persists blocks under the configured checkpoint dir") {
    checkpointDir
    val cut = Checkpointer.Reliable.cut(Seq(1, 2, 3).toDF("x"))
    assert(cut.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(checkpointDir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(files > 0, "reliable checkpoint must persist blocks under the checkpoint dir")
  }

  test("PageRank: local and reliable cuts agree rank-for-rank") {
    checkpointDir
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 3L), (1L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val local = collectSorted(PageRank.run(edges, iters = 3))
    val reliable = collectSorted(PageRank.run(edges, iters = 3, cp = Checkpointer.Reliable))
    assert(local == reliable && local.nonEmpty)
  }

  test("GlobalRank: local and reliable cuts agree on a derived (non-bare-scan) input") {
    checkpointDir
    // a derived input (filter + projection over generated data) forces the
    // materialization path in both modes
    val df = (0 until 5000).map(i => (i.toLong, (i * 37 % 1000).toDouble, s"g${i % 5}"))
      .toDF("id", "v", "g").filter(col("v") > 10).select(col("id"), col("v"), col("g"))
    val local = collectSorted(
      GlobalRank.withGlobalRowNumberAndCount(df, "v", Seq("id"), 8, "rnk")._1)
    val reliable = collectSorted(
      GlobalRank.withGlobalRowNumberAndCount(df, "v", Seq("id"), 8, "rnk",
        cp = Checkpointer.Reliable)._1)
    assert(local == reliable && local.nonEmpty)

    val localG = collectSorted(
      GlobalRank.withGroupedRowNumber(df, "g", "v", Seq("id"), 4, "rnk", "n_g"))
    val reliableG = collectSorted(
      GlobalRank.withGroupedRowNumber(df, "g", "v", Seq("id"), 4, "rnk", "n_g",
        cp = Checkpointer.Reliable))
    assert(localG == reliableG && localG.nonEmpty)
  }

  test("Dedup clusters + signatureIndex: local and reliable cuts agree") {
    checkpointDir
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 20L))
      .toDF("a", "b")
    val local = collectSorted(Dedup.clusters(pairs))
    val reliable = collectSorted(Dedup.clusters(pairs, cp = Checkpointer.Reliable))
    assert(local == reliable && local.nonEmpty)

    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "an entirely different document about spark query planning internals"))
      .toDF("doc_id", "text")
    val idxL = Dedup.signatureIndex(docs, shingleSize = 3, numPerms = 16, numBands = 4)
    val idxR = Dedup.signatureIndex(docs, shingleSize = 3, numPerms = 16, numBands = 4,
      cp = Checkpointer.Reliable)
    assert(collectSorted(idxL.banded) == collectSorted(idxR.banded))
    assert(collectSorted(idxL.sets) == collectSorted(idxR.sets))
  }
}
