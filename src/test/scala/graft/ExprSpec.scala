package graft

import org.apache.spark.sql.functions._
import graft.expr.{BorYear, MapKeys, Salt}

class ExprSpec extends SparkSpec {
  import spark.implicits._

  test("borYear encode/decode roundtrip on the valid domain (EncodeBorYearUDF.java:58-71)") {
    val rows = for {
      (bor, _) <- BorYear.EventTypeCodes
      year <- Seq(Some(1900), Some(2024), None)
    } yield (bor, year)
    val df = rows.toDF("bor", "year")
      .select(col("bor"), col("year"),
        BorYear.encode(col("bor"), col("year")).as("enc"))
      .select(col("bor"), col("year"), col("enc"),
        BorYear.decodeYear(col("enc")).as("decYear"),
        BorYear.decodeBor(col("enc")).as("decBor"))
    df.collect().foreach { r =>
      val year = if (r.isNullAt(1)) None else Some(r.getInt(1))
      assert(r.getInt(2) == year.getOrElse(0) * 100 + BorYear.EventTypeCodes.toMap.apply(r.getString(0)))
      val decYear = if (r.isNullAt(3)) None else Some(r.getInt(3))
      assert(decYear == year, "year roundtrip (null → 0 → null)")
      assert(r.getString(4) == r.getString(0), "bor roundtrip")
    }
  }

  test("salt format: zero-padded prefix in [0, modulo), parseable inverse (ModulusSalt contract)") {
    val keys = Seq("0:0", "1:212", "4:C7:3:1:2", "a-long:key:with:colons").toDF("k")
    for (modulo <- Seq(10, 100)) {
      keys.select(Salt.salted(col("k"), modulo).as("sk"), col("k")).collect().foreach { r =>
        val (sk, k) = (r.getString(0), r.getString(1))
        val digits = Salt.saltCharCount(modulo)
        assert(sk.length == digits + 1 + k.length)
        val salt = sk.substring(0, digits).toInt
        assert(salt >= 0 && salt < modulo)
        assert(sk.substring(digits + 1) == k, "suffix is the unsalted key")
      }
    }
  }

  test("salt distributes across buckets") {
    val n = 1000
    val df = (0 until n).map(i => s"key:$i").toDF("k")
      .select(Salt.saltOf(col("k"), 10).as("s"))
      .groupBy("s").count().collect()
    assert(df.length == 10, "all 10 buckets hit")
    df.foreach(r => assert(r.getLong(1) > n / 20, "no bucket under 50% of fair share"))
  }

  test("mapKeys: set semantics, null-skipping, network fan-out (MapKeysUDF.java:99-151)") {
    val df = Seq(
      (Some(1), Some(1), "ds1", Some(Seq("n1", "n1"))), // taxon dup + network dup
      (None, Some(3), "ds2", None)                      // null rank skipped
    ).toDF("k1", "k2", "ds", "nets")
      .select(MapKeys.mapKeys(
        Seq(col("k1"), col("k2")), col("ds"), lit(null), lit(null), lit(null),
        col("nets")).as("mk"))
    val got = df.collect().map(_.getSeq[String](0).toSet)
    assert(got(0) == Set("0:0", "1:1", "2:ds1", "6:n1"))
    assert(got(1) == Set("0:0", "1:3", "2:ds2"))
  }
}
