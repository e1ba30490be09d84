package graft

import graft.ops.OracleCanary

/** Pins the Spark side of every canary probe to its literal expected
  * value, so a SPARK upgrade that shifts semantics fails here while a
  * DuckDB upgrade fails the oracle hash of the `oracle_canary` key —
  * between them every drift direction is loud.
  */
class OracleCanarySpec extends SparkSpec {

  test("canary probes evaluate to their pinned literals") {
    val rows = OracleCanary.probes(spark).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    val expectedLong = Map(
      "div_truncates" -> 3L,
      "div_negative_truncates" -> -3L,
      "decimal_wide_div" -> 1428571428571428571L,
      "decimal_wide_sum" -> 3000000000000000000L,
      "sqrt_correctly_rounded" -> 1414213562373L,
      "sqrt_sqrt_correctly_rounded" -> 1189207115002L,
      "round_half_away" -> 334L, // 3*100 + (-3)*(-10) + 4
      "md5_prefix_hash" -> 901650095L,
      "nfc_normalize" -> 1L,
      // 5 vowel-group runs × 100 + 3 terminal-punctuation runs
      "regexp_count_runs" -> 503L,
      // both engines skip NULLs in greatest — the round-10 ADVICE semantic
      "greatest_ignores_null" -> 1L,
      // length(bin(1023))·100 + length(bin(1))·10 + length(bin(0))
      "bin_width" -> 1011L,
    )
    assert(rows.size == expectedLong.size + 1)
    expectedLong.foreach { case (k, v) =>
      assert(rows(k) == ((Some(v), None)), s"$k: ${rows(k)}")
    }
    assert(rows("round_6_double") == ((None, Some(0.333333))))
    // the md5-prefix pin also anchors PortableHash's local twin
    assert(graft.expr.PortableHash.phashLocal("graft-canary") == 901650095L)
  }
}
