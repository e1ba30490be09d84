package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.{NfcNormalize, PortableHash}

/** Oracle-drift canary: a constants-only probe frame over every
  * cross-engine semantic the determinism contracts lean on, mirrored
  * expression-for-expression in DuckDB. The fixture data never moves, so
  * the ONLY way this key goes red is the oracle engine (or Spark) changing
  * semantics under an upgrade — the loud alarm the `events_ewma`
  * list_reduce quirk showed is needed (DuckDB v1.0.0 struct-returning
  * list_reduce rebinds accumulator fields sequentially; see BASELINE.md).
  * The oracle version this suite is pinned against is recorded in
  * TESTDATA.md.
  *
  * Probes (each exact today in Spark 4.1.2 == DuckDB 1.0.0):
  *  - integer division: `DIV` / `//` truncate toward zero, incl. negative
  *  - DECIMAL(38,0) vs HUGEINT: wide sums and wide integer division
  *  - IEEE sqrt and sqrt∘sqrt: correctly rounded (pow/ln are NOT — they
  *    stay banned from contracts; no probe legitimizes them)
  *  - round(x, 6) on doubles and round-half behavior at .5 (both engines
  *    round half away from zero)
  *  - the md5-prefix portable hash ([[PortableHash]])
  *  - Unicode NFC normalization ([[NfcNormalize]] vs `nfc_normalize`)
  *  - regex RUN counting: `regexp_count(s, '[class]+')` vs
  *    `len(regexp_extract_all(...))` — [[graft.llm.Readability]]'s
  *    syllable/sentence contract (round-9 verdict task)
  *  - `greatest` NULL-skipping: `greatest(1, NULL) = 1` in BOTH engines —
  *    the semantic whose one-sided use the round-10 ADVICE caught in the
  *    readability mirror; DuckDB changed it in later versions
  *  - integer bit width via `length(bin(x))` — exact cross-engine integer
  *    log2, the [[graft.llm.Surprisal]] contract
  *
  * Scale: 13 literal rows; cost is plan-constant.
  */
object OracleCanary {

  /** The probe frame: (probe, val_long, val_double), one row per probe. */
  def probes(spark: SparkSession): DataFrame = {
    val one = spark.range(1)
    def p(name: String, vl: Column, vd: Column) =
      one.select(lit(name).as("probe"), vl.cast("long").as("val_long"),
        vd.cast("double").as("val_double"))
    val nul = lit(null)
    Seq(
      p("div_truncates", expr("7 DIV 2"), nul),
      p("div_negative_truncates", expr("-7 DIV 2"), nul),
      p("decimal_wide_div",
        expr("CAST(10000000000000000000 AS DECIMAL(38,0)) DIV 7"), nul),
      p("decimal_wide_sum",
        expr("CAST(3 * CAST(1000000000000000000 AS DECIMAL(38,0)) AS DECIMAL(38,0))"),
        nul),
      p("sqrt_correctly_rounded",
        floor(sqrt(lit(2.0)) * lit(1000000000000L)), nul),
      p("sqrt_sqrt_correctly_rounded",
        floor(sqrt(sqrt(lit(2.0))) * lit(1000000000000L)), nul),
      p("round_half_away", round(lit(2.5)) * 100 + round(lit(-2.5)) * -10
        + round(lit(3.5)), nul),
      p("round_6_double", nul, round(lit(1.0) / lit(3.0), 6)),
      p("md5_prefix_hash", PortableHash.phash(lit("graft-canary")), nul),
      p("nfc_normalize",
        length(NfcNormalize.nfc(concat(lit("e"), lit("\u0301")))), nul),
      p("regexp_count_runs",
        regexp_count(lit("banana!! why?? end."), lit("[aeiouy]+")) * 100
          + regexp_count(lit("banana!! why?? end."), lit("[.!?]+")), nul),
      p("greatest_ignores_null",
        greatest(lit(1), lit(null).cast("int")), nul),
      p("bin_width", length(bin(lit(1023L))) * 100
        + length(bin(lit(1L))) * 10 + length(bin(lit(0L))), nul),
    ).reduce(_ union _).orderBy("probe")
  }

  /** DuckDB mirror of [[probes]], expression-for-expression. */
  def sql: String =
    s"""SELECT 'div_truncates' AS probe, (7 // 2)::BIGINT AS val_long,
       |       NULL::DOUBLE AS val_double
       |UNION ALL SELECT 'div_negative_truncates', ((-7) // 2)::BIGINT, NULL
       |UNION ALL SELECT 'decimal_wide_div',
       |  (10000000000000000000::HUGEINT // 7)::BIGINT, NULL
       |UNION ALL SELECT 'decimal_wide_sum',
       |  (3 * 1000000000000000000::HUGEINT)::BIGINT, NULL
       |UNION ALL SELECT 'sqrt_correctly_rounded',
       |  floor(sqrt(2::DOUBLE) * 1000000000000)::BIGINT, NULL
       |UNION ALL SELECT 'sqrt_sqrt_correctly_rounded',
       |  floor(sqrt(sqrt(2::DOUBLE)) * 1000000000000)::BIGINT, NULL
       |UNION ALL SELECT 'round_half_away',
       |  (round(2.5) * 100 + round(-2.5) * -10 + round(3.5))::BIGINT, NULL
       |UNION ALL SELECT 'round_6_double', NULL,
       |  round(1::DOUBLE / 3::DOUBLE, 6)
       |UNION ALL SELECT 'md5_prefix_hash',
       |  ${PortableHash.sqlPhash("'graft-canary'")}, NULL
       |UNION ALL SELECT 'nfc_normalize',
       |  length(${NfcNormalize.sqlNfc("'e' || chr(769)")})::BIGINT, NULL
       |UNION ALL SELECT 'regexp_count_runs',
       |  (len(regexp_extract_all('banana!! why?? end.', '[aeiouy]+')) * 100
       |   + len(regexp_extract_all('banana!! why?? end.', '[.!?]+')))::BIGINT,
       |  NULL
       |UNION ALL SELECT 'greatest_ignores_null',
       |  greatest(1, NULL::INTEGER)::BIGINT, NULL
       |UNION ALL SELECT 'bin_width',
       |  (length(bin(1023::BIGINT)) * 100 + length(bin(1::BIGINT)) * 10
       |   + length(bin(0::BIGINT)))::BIGINT, NULL
       |ORDER BY probe""".stripMargin
}
