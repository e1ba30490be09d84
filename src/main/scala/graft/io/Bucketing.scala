package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle once at write time so repeated joins
  * and aggregations on the bucket key run exchange-free.
  *
  * 100 TB posture: the fact tables of a map/training pipeline are written
  * once and joined many times (per projection × zoom pass, per training
  * epoch). Bucketing both sides of a recurring equi-join on the same key
  * and count makes every subsequent join a zipped local join — zero
  * shuffle, verified by plan assertion in `BucketingSpec`.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (overwriting any previous). */
  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String, numBuckets: Int,
      sortCol: Option[String] = None): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    val w = df.write.mode("overwrite").bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Number of shuffle exchanges in a frame's executed plan (0 for a
    * correctly bucketed join).
    */
  def countShuffles(df: DataFrame): Int =
    "ShuffleExchange".r.findAllIn(df.queryExecution.executedPlan.toString).length
}
