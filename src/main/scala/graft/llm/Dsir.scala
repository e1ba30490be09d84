package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** DSIR-shaped data selection (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score documents by how
  * TARGET-like their hashed-n-gram profile is. Features are the hashing
  * trick over unigram+bigram token hashes ([[Buckets]] cells); each
  * feature carries a smoothed target/source likelihood ratio in ppm, and a
  * document's score is the count-weighted mean ratio delta — an
  * exact-integer rational kernel standing in for the paper's
  * sum-of-log-ratios (log is monotone per feature; the rational form is
  * bit-replayable cross-engine, the repo's determinism contract).
  *
  * Scale: the ratio table is [[Buckets]] rows (broadcast); the corpus side
  * is one token-linear explode + two map-side-combined hash aggs — no
  * shuffle wider than (doc_id, bucket). Per-doc sums accumulate in
  * DECIMAL(38,0) (a rare-feature ratio can reach ~1e12 ppm; long would
  * wrap) — the PageRank in-aggregate-cast lesson.
  *
  * Split into train ([[ratios]]) and apply ([[score]]) so the streaming
  * admission path can score NEW batches against a FROZEN corpus-trained
  * ratio table ([[graft.streaming.DocStream.dsirProbe]]) — the same
  * frozen-state contract as the near-dup and span probes.
  */
object Dsir {

  /** Hashed-feature bucket count and the target slice (shared with the
    * SparkEntry oracle).
    */
  val Buckets = 256L
  val TargetLang = "en"

  /** Per-(doc, feature) counts with the doc's target flag: the staged
    * feature stream both training and scoring read. The tokenize→md5 pass
    * is cut BEFORE the shingle lambda: inlined, the hash-array expression
    * re-evaluates inside every element_at of hashedShingles — O(tokens²)
    * md5 calls per doc (measured 47 s vs ~1 s staged at sf0.1; the
    * round-2/3/5 footgun, PlanGuardSpec).
    */
  def docFeatures(docs: DataFrame, tgt: Column): DataFrame = {
    val thf = docs
      .select(col("doc_id"), tgt.as("tgt"),
        Dedup.tokenHashes(TextAnalysis.tokens(col("text"))).as("th"))
      .localCheckpoint()
    thf
      .select(col("doc_id"), col("tgt"),
        explode(concat(col("th"), Dedup.hashedShingles(col("th"), 2))).as("h"))
      .select(col("doc_id"), col("tgt"), (col("h") % Buckets).as("f"))
      .groupBy("doc_id", "tgt", "f")
      .agg(count(lit(1)).as("c"))
  }

  /** The bucket-ratio table (f, r_ppm): smoothed target/source likelihood
    * ratio per feature, exact integer ppm —
    * `((ct+1)·(Ts+B)·10⁶) div ((cs+1)·(Tt+B))` in DECIMAL(38,0).
    * [[Buckets]] rows at any corpus size; broadcast by every consumer.
    */
  def ratios(dfc: DataFrame): DataFrame = {
    val fc = dfc.groupBy("f").agg(sum("c").as("cs"),
      sum(when(col("tgt"), col("c")).otherwise(0L)).as("ct"))
    val tot = fc.agg(sum("cs").as("ts"), sum("ct").as("tt")) // 1 row
    fc.crossJoin(broadcast(tot)).select(col("f"),
      expr(s"""CAST((CAST(ct + 1 AS DECIMAL(38,0)) * (ts + $Buckets) * 1000000)
              | div (CAST(cs + 1 AS DECIMAL(38,0)) * (tt + $Buckets)) AS BIGINT)"""
        .stripMargin.replace("\n", " ")).as("r_ppm"))
  }

  /** Score per doc against a (frozen or fresh) ratio table: n_feats,
    * score_ppm (count-weighted mean ratio delta, floored), keep = positive
    * score. `allDocIds` re-attaches featureless documents (empty text)
    * with score 0 so the output covers every input row.
    */
  def score(dfc: DataFrame, ratioTable: DataFrame,
            allDocIds: DataFrame): DataFrame = {
    val sc = dfc.join(broadcast(ratioTable), Seq("f"))
      .groupBy("doc_id")
      .agg(sum(col("c").cast(DecimalType(38, 0)) * (col("r_ppm") - lit(1000000L)))
          .as("w"),
        sum("c").as("nf"))
      .select(col("doc_id"), col("nf"),
        expr("CAST((w - pmod(w, nf)) div nf AS BIGINT)").as("sp"))
    allDocIds.select(col("doc_id")).join(sc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nf"), lit(0L)).as("n_feats"),
        coalesce(col("sp"), lit(0L)).as("score_ppm"),
        coalesce(col("sp") > 0, lit(false)).as("keep"))
  }
}
