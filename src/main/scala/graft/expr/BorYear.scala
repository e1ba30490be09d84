package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** basisOfRecord × year → int codec (reference: `EncodeBorYearUDF.java:28-71`).
  *
  * `encoded = year*100 + borCode`, with `year == null → 0`
  * (`EncodeBorYearUDF.java:58-62`). The reference registers a JVM UDF —
  * opaque to Catalyst; we express the codec as pure `Column` arithmetic so it
  * stays inside whole-stage codegen and the oracle can recompute it.
  */
object BorYear {

  /** The reference's 9-entry basisOfRecord code table
    * (`EncodeBorYearUDF.java:33-43`).
    */
  val GbifBorCodes: Seq[(String, Int)] = Seq(
    "PRESERVED_SPECIMEN" -> 0,
    "MACHINE_OBSERVATION" -> 1,
    "OCCURRENCE" -> 2,
    "HUMAN_OBSERVATION" -> 3,
    "LIVING_SPECIMEN" -> 4,
    "OBSERVATION" -> 5,
    "MATERIAL_CITATION" -> 6,
    "MATERIAL_SAMPLE" -> 7,
    "FOSSIL_SPECIMEN" -> 8
  )

  /** Test-fixture analog: `events.event_type` plays basisOfRecord
    * (FIXTURES.md occurrence-analog mapping).
    */
  val EventTypeCodes: Seq[(String, Int)] = Seq(
    "signup" -> 0,
    "click" -> 1,
    "error" -> 2,
    "view" -> 3,
    "purchase" -> 4
  )

  /** bor string → int code as a CASE chain (codegen-friendly literal lookup). */
  def borCode(bor: Column, codes: Seq[(String, Int)] = EventTypeCodes): Column =
    codes.foldLeft(lit(null).cast(IntegerType)) { case (acc, (name, code)) =>
      when(bor === lit(name), lit(code)).otherwise(acc)
    }

  /** `encode(bor, year)` — `EncodeBorYearUDF.java:58-62`. */
  def encode(bor: Column, year: Column, codes: Seq[(String, Int)] = EventTypeCodes): Column =
    (coalesce(year, lit(0)) * lit(100) + borCode(bor, codes)).cast(IntegerType)

  /** Inverse: year component; 0 decodes to null (`EncodeBorYearUDF.java:64-67`). */
  def decodeYear(encoded: Column): Column = {
    val y = floor(encoded / lit(100)).cast(IntegerType)
    when(y > lit(0), y).otherwise(lit(null).cast(IntegerType))
  }

  /** Inverse: bor code → string (`EncodeBorYearUDF.java:69-71`). */
  def decodeBor(encoded: Column, codes: Seq[(String, Int)] = EventTypeCodes): Column = {
    val m = pmod(encoded, lit(100))
    codes.foldLeft(lit(null).cast("string")) { case (acc, (name, code)) =>
      when(m === lit(code), lit(name)).otherwise(acc)
    }
  }

  /** DuckDB SQL for [[borCode]] over expression `e`. */
  def sqlBorCode(e: String, codes: Seq[(String, Int)] = EventTypeCodes): String =
    codes.map { case (n, c) => s"WHEN '$n' THEN $c" }
      .mkString(s"(CASE $e ", " ", " END)")

  /** DuckDB SQL for [[encode]]. */
  def sqlEncode(borE: String, yearE: String,
                codes: Seq[(String, Int)] = EventTypeCodes): String =
    s"((COALESCE($yearE, 0) * 100 + ${sqlBorCode(borE, codes)})::INTEGER)"

  /** DuckDB SQL for [[decodeYear]]. */
  def sqlDecodeYear(e: String): String =
    s"(CASE WHEN ($e // 100) > 0 THEN ($e // 100)::INTEGER ELSE NULL END)"

  /** DuckDB SQL for [[decodeBor]]. */
  def sqlDecodeBor(e: String, codes: Seq[(String, Int)] = EventTypeCodes): String =
    codes.map { case (n, c) => s"WHEN $c THEN '$n'" }
      .mkString(s"(CASE ($e % 100) ", " ", " END)")
}
