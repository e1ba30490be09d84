package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.io.Formats

/** Source/sink round trips for every bundled format, against the real
  * fixture tables (values, not just schemas, must survive).
  */
class FormatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def roundTrip(format: String): Unit = {
    val dir = Files.createTempDirectory(s"graft_$format").toString
    val src = Tables.nation(spark, sf)
    Formats.write(src, s"$dir/nation", format)
    val back = format match {
      case "parquet" => Formats.readParquet(spark, s"$dir/nation")
      case "orc" => Formats.readOrc(spark, s"$dir/nation")
      case "csv" => Formats.readCsv(spark, s"$dir/nation", src.schema)
      case "json" => Formats.readJson(spark, s"$dir/nation", src.schema)
    }
    val a = src.orderBy("n_nationkey").collect().map(_.toSeq).toSeq
    val b = back.orderBy("n_nationkey").collect().map(_.toSeq).toSeq
    assert(a == b, s"$format round trip preserves all values")
  }

  test("parquet round trip")(roundTrip("parquet"))
  test("orc round trip")(roundTrip("orc"))
  test("csv round trip (pinned schema)")(roundTrip("csv"))
  test("json round trip (pinned schema)")(roundTrip("json"))

  test("csv survives a timestamp column with pinned format") {
    val dir = Files.createTempDirectory("graft_csv_ts").toString
    val src = Tables.orders(spark, sf).select("o_orderkey", "o_orderdate")
    Formats.write(src, s"$dir/o", "csv")
    val back = Formats.readCsv(spark, s"$dir/o", src.schema)
    assert(back.filter(col("o_orderdate").isNull).count() == 0)
    // NTZ timestamps surface as LocalDateTime — compare generically
    assert(back.agg(max("o_orderdate")).collect().head.get(0) ==
      src.agg(max("o_orderdate")).collect().head.get(0))
  }
}
