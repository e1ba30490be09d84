package graft

import org.apache.spark.sql.SparkSession

/** Mirrors the driver's t1 smoke: run `SparkEntry.entry` on an
  * externally-created session (no GraftConf pre-applied) and print the row
  * count — the driver checks rows > 0.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, false)
    println(s"[smoke] entry rows=$n")
    spark.stop()
  }
}
