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
      case "avro" => Formats.readAvro(spark, s"$dir/nation")
      case "csv" => Formats.readCsv(spark, s"$dir/nation", src.schema)
      case "json" => Formats.readJson(spark, s"$dir/nation", src.schema)
    }
    val a = src.orderBy("n_nationkey").collect().map(_.toSeq).toSeq
    val b = back.orderBy("n_nationkey").collect().map(_.toSeq).toSeq
    assert(a == b, s"$format round trip preserves all values")
  }

  test("parquet round trip")(roundTrip("parquet"))
  test("orc round trip")(roundTrip("orc"))
  test("avro round trip (the reference's ingest format)")(roundTrip("avro"))
  test("csv round trip (pinned schema)")(roundTrip("csv"))
  test("json round trip (pinned schema)")(roundTrip("json"))

  test("Tables format seam: same queries run unchanged over an ORC copy of the tables") {
    val dir = Files.createTempDirectory("graft_seam").toString
    // materialize ORC copies at the seam's expected layout <dir>/<name>.orc
    for (name <- Seq("events", "nation")) {
      Formats.write(Tables.table(spark, sf, name), s"$dir/$name.orc", "orc")
    }
    val parquetResult = SparkEntry.queries("filter_quality")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val parquetNation = Tables.nation(spark, sf).count()
    spark.conf.set(Tables.FormatKey, "orc")
    try {
      val orcResult = SparkEntry.queries("filter_quality")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(orcResult == parquetResult,
        "filter_quality over ORC == over parquet, query code untouched")
      assert(Tables.nation(spark, dir).count() == parquetNation)
    } finally spark.conf.set(Tables.FormatKey, "parquet")
  }

  test("Tables format seam: scan_project runs unchanged over an Avro snapshot (the reference's ingest)") {
    val dir = Files.createTempDirectory("graft_avro_seam").toString
    Formats.write(Tables.table(spark, sf, "events"), s"$dir/events.avro", "avro")
    val parquetResult = SparkEntry.queries("scan_project")(spark, sf)
      .collect().map(_.toSeq).toSeq
    spark.conf.set(Tables.FormatKey, "avro")
    try {
      val avroResult = SparkEntry.queries("scan_project")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(avroResult == parquetResult,
        "scan_project over the Avro snapshot == over parquet, query code untouched")
    } finally spark.conf.set(Tables.FormatKey, "parquet")
  }

  test("Tables format seam rejects schema-inferring text formats") {
    spark.conf.set(Tables.FormatKey, "csv")
    try {
      val e = intercept[IllegalArgumentException](Tables.nation(spark, sf))
      assert(e.getMessage.contains("pinned schema"))
    } finally spark.conf.set(Tables.FormatKey, "parquet")
  }

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
