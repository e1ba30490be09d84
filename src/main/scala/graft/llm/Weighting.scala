package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.PortableHash

/** Sampling-weight operators — the soft alternatives to hard keep/drop
  * verdicts. Two members:
  *
  *   - [[softDedup]]: SoftDeDup-style frequency downweighting — instead
  *     of dropping exact duplicates (the [[Dedup]] owner convention), KEEP
  *     every copy but weight it 1/m so the duplicate GROUP contributes one
  *     document's worth of gradient mass. The published motivation:
  *     hard-dropping boilerplate-heavy pages biases the mixture; soft
  *     weights preserve coverage while killing over-counting.
  *   - [[poissonEpochs]]: deterministic per-epoch Poisson subsampling —
  *     the data-constrained-LM recipe (multi-epoch training wants a
  *     DIFFERENT random subset each epoch, reproducibly). Epoch e keeps a
  *     doc iff phash("pe-v1:e:" + doc_id) mod 10⁶ < rate_ppm — no RNG
  *     state, any engine replays it, and the per-epoch samples are
  *     pairwise independent in the hash.
  *
  * Scale shape: softDedup is one fingerprint hash aggregate + one
  * doc-keyed join-back (map-side-combinable, the dedup_exact shape);
  * poissonEpochs is a constant-width epoch explode (docs × E rows) with
  * pure per-row hash math — both corpus-linear, nothing collected.
  */
object Weighting {

  /** Epoch count for [[poissonEpochs]] — a query literal, not a tuned
    * knob (4 epochs is the data-constrained regime's working range). */
  val Epochs: Int = 4

  /** Per-epoch keep rate in ppm. */
  val EpochRatePpm: Long = 600000L

  /** (doc_id, dup_count, weight_ppm) for every doc: dup_count = size of
    * its exact-fingerprint group, weight_ppm = 10⁶ DIV dup_count.
    */
  def softDedup(docs: DataFrame): DataFrame = {
    val fp = docs.select(col("doc_id"), Dedup.fingerprint(col("text")).as("fp"))
    val groups = fp.groupBy("fp").agg(count(lit(1)).as("dup_count"))
    fp.join(groups, Seq("fp"))
      .select(col("doc_id"), col("dup_count"),
        call_function("div", lit(1000000L), col("dup_count")).as("weight_ppm"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[softDedup]], term-for-term. */
  def sqlSoftDedup: String =
    s"""WITH fp AS (SELECT doc_id, ${Dedup.sqlFingerprint("text")} AS fp
       |  FROM documents),
       |g AS (SELECT fp, count(*)::BIGINT AS dup_count FROM fp GROUP BY 1)
       |SELECT doc_id, dup_count, (1000000 // dup_count)::BIGINT AS weight_ppm
       |FROM fp JOIN g USING (fp) ORDER BY doc_id""".stripMargin

  /** (doc_id, epoch, keep) for every doc × epoch 1..[[Epochs]], plus the
    * per-doc rollup is left to the caller's aggregation — this emits the
    * per-doc summary (n_epochs_kept, epochs_mask with bit e−1 set when
    * epoch e keeps the doc).
    */
  def poissonEpochs(docs: DataFrame): DataFrame = {
    val e = docs.select(col("doc_id"),
      explode(sequence(lit(1), lit(Epochs))).as("epoch"))
    val keep = pmod(PortableHash.phash(
      concat(lit("pe-v1:"), col("epoch").cast("string"), lit(":"),
        col("doc_id").cast("string"))), lit(1000000L)) < EpochRatePpm
    e.select(col("doc_id"), col("epoch"), keep.as("k"))
      .groupBy("doc_id")
      .agg(sum(when(col("k"), 1L).otherwise(0L)).as("n_epochs_kept"),
        sum(when(col("k"),
          expr("shiftleft(CAST(1 AS BIGINT), epoch - 1)")).otherwise(0L))
          .as("epochs_mask"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[poissonEpochs]], term-for-term. */
  def sqlPoissonEpochs: String = {
    val h = PortableHash.sqlPhash(
      "('pe-v1:' || epoch::VARCHAR || ':' || doc_id::VARCHAR)")
    s"""WITH e AS (SELECT doc_id, unnest(generate_series(1, $Epochs)) AS epoch
       |  FROM documents),
       |k AS (SELECT doc_id, epoch,
       |        (($h) % 1000000) < $EpochRatePpm AS k
       |      FROM e)
       |SELECT doc_id,
       |  sum(CASE WHEN k THEN 1 ELSE 0 END)::BIGINT AS n_epochs_kept,
       |  sum(CASE WHEN k THEN (1::BIGINT << (epoch - 1)) ELSE 0 END)::BIGINT
       |    AS epochs_mask
       |FROM k GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
