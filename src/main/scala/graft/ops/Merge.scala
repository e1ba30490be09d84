package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE INTO semantics (dimension upsert) as a plain full-outer shuffle
  * join — the lakehouse write path (Delta/Iceberg MERGE) re-expressed as
  * the join it compiles to, so the engine can maintain dimensions without
  * a table format.
  *
  * Design for 100 TB:
  *   - MERGE *is* a full-outer equi-join on the key: one shuffle of each
  *     side, AQE free to pick skew splits. No driver-side diffing.
  *   - When the updates batch is small (the common CDC case) Catalyst
  *     can't broadcast a full-outer join, so high-volume deployments
  *     split it: inner join (matched) + left-anti each way — both
  *     broadcast-able. `upsertSplit` provides that shape; results are
  *     identical (`MergeSpec`).
  *   - Output carries an `action` audit column (`updated`/`inserted`/
  *     `unchanged`) — the per-row provenance a MERGE sink needs for
  *     idempotent retries and metrics.
  */
object Merge {

  /** Full-outer scaffold: every dim and update row, key coalesced, with
    * the MERGE action classified. Callers project the merged columns.
    */
  def outerMerge(dim: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val d = dim.withColumnRenamed(key, "__dk")
    val u = updates.withColumnRenamed(key, "__uk")
    d.join(u, col("__dk") === col("__uk"), "full_outer")
      .withColumn(key, coalesce(col("__dk"), col("__uk")))
      .withColumn("action",
        when(col("__dk").isNotNull && col("__uk").isNotNull, lit("updated"))
          .when(col("__dk").isNull, lit("inserted"))
          .otherwise(lit("unchanged")))
  }

  /** Broadcast-friendly twin: inner + anti + anti. Identical rows to
    * [[outerMerge]]; three joins but each eligible for broadcast when
    * `updates` is a small CDC batch — the shape to ship when the update
    * side is ≪ the dimension.
    */
  def outerMergeSplit(dim: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val d = dim.withColumnRenamed(key, "__dk")
    val u = updates.withColumnRenamed(key, "__uk")
    val matched = d.join(u, col("__dk") === col("__uk"), "inner")
      .withColumn(key, col("__dk")).withColumn("action", lit("updated"))
    val unchanged = d.join(u, col("__dk") === col("__uk"), "left_anti")
      .withColumn(key, col("__dk")).withColumn("action", lit("unchanged"))
    val inserted = u.join(d, col("__dk") === col("__uk"), "left_anti")
      .withColumn(key, col("__uk")).withColumn("action", lit("inserted"))
    // align schemas: missing side columns become null, as in the full outer
    val allCols = matched.columns
    def align(f: DataFrame): DataFrame =
      f.select(allCols.map(c =>
        if (f.columns.contains(c)) col(c) else lit(null).as(c)): _*)
    align(matched).unionAll(align(unchanged)).unionAll(align(inserted))
  }
}
