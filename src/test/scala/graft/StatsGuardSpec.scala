package graft

import graft.ops.Stats

/** The loud-overflow contract on the exact-moment stats (round-10, closing
  * round-8 ADVICE #4): past the documented DECIMAL(38,0) headroom the
  * moment products overflow to NULL on Spark while DuckDB HUGEINT holds to
  * ~1.7e38 or errors — these specs prove the Spark side now raises instead
  * of silently NULLing. The DuckDB mirrors carry `error()` at the SAME
  * bounds; the twin run (same adversarial rows through sqlAnovaTypes /
  * sqlKruskalTypes / the stats_linreg oracle SQL, each erroring loudly) is
  * recorded in BASELINE.md round 10.
  */
class StatsGuardSpec extends SparkSpec {
  import spark.implicits._

  /** Collect and expect a LOUD error: either the named headroom guard or —
    * where the overflow happens mid-aggregate before the guard can run —
    * the ANSI NUMERIC_VALUE_OUT_OF_RANGE that GraftConf pins on. Both
    * satisfy the contract (no silent NULL); silence is the only failure.
    */
  private def expectRaise(df: org.apache.spark.sql.DataFrame, needle: String): Unit = {
    val e = intercept[Throwable] { df.collect() }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    val msgs = chain(e).map(t => String.valueOf(t.getMessage)).mkString(" | ")
    assert(msgs.contains(needle) || msgs.contains("NUMERIC_VALUE_OUT_OF_RANGE"),
      s"expected a loud '$needle' (or ANSI out-of-range) error, got: $msgs")
  }

  test("anova: cent-mass beyond the S^2 headroom raises, never a silent NULL") {
    // 2 rows of 5e16 dollars → per-type S = 1e19 cents > MaxCentMass=3e18;
    // S² = 1e38 would overflow DECIMAL(38,0) to NULL without the guard
    val df = Seq(("a", 1000000000L, 5.0e16), ("a", 2000000000L, 5.0e16),
      ("b", 3000000000L, 1.0)).toDF("event_type", "ts", "value")
    expectRaise(Stats.anovaTypes(df), "stats_anova")
  }

  test("kruskal: n beyond the rank-sum headroom raises (bound injected small)") {
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 3L, 3.0))
      .toDF("event_type", "ts", "value")
    expectRaise(Stats.kruskalTypes(df, maxN = 2), "stats_kruskal")
    // and the production bound leaves the same input untouched
    assert(Stats.kruskalTypes(df).collect().length == 1)
  }

  test("linreg: overflowed moment products raise, never a silent NULL slope") {
    // adversarial ts (~2223 AD, x ≈ 2.2e6 hours) × value 1e30 → per-row
    // x·y ≈ 2.2e38 overflows DECIMAL(38,0), so sxy aggregates to NULL —
    // the exact signature the guard converts into a loud error
    val df = Seq(("a", 8000000000000000000L, 1.0e30),
      ("a", 8000000000100000000L, 1.0e30)).toDF("event_type", "ts", "value")
    expectRaise(Stats.linreg(df), "stats_linreg")
  }

  test("in-contract input is untouched by the guards") {
    val df = Seq(("a", 1000000000000L, 12.5), ("a", 72000000000000L, 9.25),
      ("b", 3600000000000L, 4.0), ("b", 7200000000000L, 8.0))
      .toDF("event_type", "ts", "value")
    assert(Stats.anovaTypes(df).collect().length == 1)
    assert(Stats.linreg(df).collect().length == 2)
    assert(Stats.kruskalTypes(df).collect().length == 1)
  }
}
