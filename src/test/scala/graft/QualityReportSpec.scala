package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** quality_report == the single-window nearest-lower-rank percentile
  * definition, bitwise (the distributed grouped rank must not drift from
  * the textbook form).
  */
class QualityReportSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("quality_report matches the window-percentile definition row-for-row") {
    val viaKey = SparkEntry.queries("quality_report")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val base = Tables.documents(spark, d).select(col("doc_id"), col("source"),
        graft.llm.TextAnalysis.qualityScore(col("text")).as("q"))
      .select(col("doc_id"), col("source"),
        expr("CAST(round(q * 1000000, 0) AS BIGINT)").as("q_ppm"))
    val w = Window.partitionBy("source").orderBy("q_ppm", "doc_id")
    val ranked = base
      .withColumn("rnk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("source")))
    val expected = (for {
      p <- Seq(25L, 50L, 75L)
      r <- ranked.filter(col("rnk") === expr(s"((n - 1) * $p) div 100") + 1).collect()
    } yield (r.getAs[String]("source"), p) ->
      ((r.getAs[Long]("n"), r.getAs[Long]("q_ppm")))).toMap
    assert(viaKey == expected)
    assert(viaKey.nonEmpty && viaKey.keySet.map(_._2) == Set(25L, 50L, 75L))
  }
}
