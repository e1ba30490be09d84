package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Closed-form distributed statistics over the events stream. */
object Stats {

  /** Loud-overflow contract (round-10, deferred twice as round-8 ADVICE
    * #4): past the documented headroom the DECIMAL(38,0) moment products
    * overflow to NULL on Spark (non-ANSI) while DuckDB HUGEINT holds to
    * ~1.7·10³⁸ or errors — a silent cross-engine divergence. Every moment
    * chain therefore guards its aggregated moments with `raise_error` /
    * `error()` at the SAME bound in BOTH engines, so out-of-headroom input
    * fails loudly and identically (StatsGuardSpec + the DuckDB twin run
    * recorded in BASELINE.md round 10). The guards never fire on
    * in-contract input — oracle parity is untouched.
    */

  /** Per-type / total cent-mass bound for [[anovaTypes]]: |S| ≤ 3·10¹⁸
    * keeps S² ≤ 9·10³⁶ < 10³⁸ with headroom for the DIV chain. */
  val MaxCentMass: Long = 3000000000000000000L

  /** Event-count bound for [[kruskalTypes]]: rank sums square to ~4N⁴,
    * which stays inside DECIMAL(38,0) to ~3·10⁹ events. */
  val KruskalMaxN: Long = 3000000000L

  /** Epoch hours at 2024-01-01T00:00Z — the x-origin for [[linreg]], kept
    * small so the moment sums stay far from the 2^53 double-cast edge.
    */
  val LinregHour0: Long = 1704067200L / 3600L

  /** Per-type OLS of event value (cents) against event hour: slope and
    * intercept from the five classic moment sums. Exactness contract
    * (shared with `stats_corr`): sums accumulate in DECIMAL(38,0) over
    * scaled integers — order-independent and map-side combinable — and
    * each coefficient is ONE correctly-rounded double division of exact
    * integer numerator/denominator, so the rounded output is bit-equal
    * across engines. Scale shape: one hash aggregate (5 cells here; any
    * group count shuffles on the group key), nothing else.
    *
    * Input needs `event_type`, `ts` (nanos long), `value` (double).
    */
  def linreg(events: DataFrame): DataFrame =
    linregRaw(events).orderBy("event_type")

  /** Welch's unequal-variance t statistic for every PAIR of event types —
    * "is the mean value of `purchase` really different from `view`?", the
    * A/B primitive. Exactness contract: per-type moments (n, Σ, Σ²)
    * accumulate exactly in DECIMAL over cents; the t statistic is then a
    * short chain of correctly-rounded IEEE ops (casts of exact integers,
    * -, *, /, sqrt — all correctly rounded, no libm transcendentals), so
    * round(t, 6) is bit-equal across engines. Sample variance uses the
    * n−1 denominator. Scale shape: ONE hash aggregate over the corpus,
    * then a #types² self-join of a #types-row frame.
    */
  def welchPairs(events: DataFrame): DataFrame = {
    val m = events
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS DECIMAL(38,0))").as("y"))
      .groupBy("event_type")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("y")).as("s"), sum(col("y") * col("y")).as("ss"))
      .localCheckpoint() // #types rows feed both sides of the pair join
    def side(tag: String) = m.select(
      col("event_type").as(s"type_$tag"), col("n").as(s"n_$tag"),
      col("s").as(s"s_$tag"), col("ss").as(s"ss_$tag"))
    // mean = s/n; var = (n·ss − s²) / (n·(n−1)) — all exact DECIMAL
    // numerators/denominators, divided once in double precision.
    def mean(t: String) = col(s"s_$t").cast("double") / col(s"n_$t").cast("double")
    def vr(t: String) =
      (col(s"n_$t") * col(s"ss_$t") - col(s"s_$t") * col(s"s_$t")).cast("double") /
        (col(s"n_$t") * (col(s"n_$t") - 1)).cast("double")
    // degenerate guard: both variances zero (all values constant) makes
    // the denominator 0 — define t = 0 there (Spark double/0 is Inf,
    // DuckDB NULL; neither is comparable)
    val se2 = vr("a") / col("n_a").cast("double") +
      vr("b") / col("n_b").cast("double")
    side("a").join(side("b"), col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"),
        col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
        when(se2 === 0.0, 0.0)
          .otherwise(round((mean("a") - mean("b")) / sqrt(se2), 6)).as("t_r"))
      .orderBy("type_a", "type_b")
  }

  /** Pearson χ² independence statistic for event_type × hour-of-day —
    * "does traffic mix shift by hour?", the seasonality-vs-type screen.
    * Identity: χ² = N·Σ O²/(rt·ct) − N, which is EXACT when summed over
    * observed cells only — unlike Σ(O−E)²/E, where every EMPTY
    * contingency cell still contributes rt·ct/N and a cells-frame sum
    * would silently drop it (review finding, round 8). Exactness
    * contract: a DOUBLE sum would depend on partition order, so each
    * cell's term is the exact integer `O²·N·10⁶ DIV (rt·ct)` in
    * DECIMAL(38,0) (χ²·10⁶ with per-cell truncation, both engines share
    * the definition); terms sum exactly, then subtract N·10⁶. Term bound
    * ~N³·10⁶ → DECIMAL(38) headroom to ~10¹⁰ events per run.
    * dof counts OBSERVED type/hour levels. Scale shape: one (type, hour)
    * hash aggregate (≤ types×24 cells), two marginal re-aggregates of
    * that cell frame, equi-joins back on type / hour, a 1-row N
    * broadcast — nothing corpus-sized after the first aggregate.
    */
  def chisqTypeHour(events: DataFrame): DataFrame = {
    val cells = events.select(col("event_type"),
        pmod(graft.expr.IntMath.floorDiv(col("ts"), 3600L * 1000000000L),
          lit(24L)).as("hod"))
      .groupBy("event_type", "hod")
      .agg(count(lit(1)).cast("decimal(38,0)").as("o"))
      .localCheckpoint() // feeds both marginals and the term sum
    val rt = cells.groupBy("event_type").agg(sum(col("o")).as("rt"))
    val ct = cells.groupBy("hod").agg(sum(col("o")).as("ct"))
    val n1 = cells.agg(sum(col("o")).as("nn"),
      countDistinct(col("event_type")).as("n_types"),
      countDistinct(col("hod")).as("n_hods"))
    cells.join(rt, Seq("event_type")).join(ct, Seq("hod"))
      .crossJoin(broadcast(n1)) // 1-row totals
      .select(col("nn"), col("n_types"), col("n_hods"),
        expr("(o * o * nn * 1000000) DIV (rt * ct)").as("term"))
      .groupBy("nn", "n_types", "n_hods")
      .agg(sum(col("term")).as("tsum"))
      .select(col("nn").cast("long").as("n"),
        ((col("n_types") - 1) * (col("n_hods") - 1)).cast("long").as("dof"),
        (col("tsum") - col("nn") * 1000000).cast("long").as("chisq_micro"))
  }

  /** [[linreg]] without the final sort — the same plan is STREAM-legal:
    * the moment sums are an ordinary (map-side-combinable) aggregation, so
    * the identical code runs under `readStream` in complete/update mode as
    * the online-regression twin; `StatsStreamParity` in LinregSpec pins
    * stream == batch on the same data.
    */
  def linregRaw(events: DataFrame): DataFrame = {
    val e = events.select(
      col("event_type"),
      (graft.expr.IntMath.floorDiv(col("ts"), 3600L * 1000000000L) - LinregHour0)
        .cast("decimal(38,0)").as("x"),
      expr("CAST(round(value * 100) AS DECIMAL(38,0))").as("y"))
    val denD = col("n") * col("sxx") - col("sx") * col("sx")
    val den = denD.cast("double")
    val numSlope = col("n") * col("sxy") - col("sx") * col("sy")
    val numIcept = col("sy") * col("sxx") - col("sx") * col("sxy")
    // Loud-overflow guard (the [[MaxCentMass]]-contract class): a DECIMAL
    // moment or moment product that overflowed to NULL must raise, never
    // flow NULL into the rounded division. With ANSI pinned on (GraftConf)
    // the overflow itself already errors loudly mid-aggregate, so this is
    // the defense-in-depth layer for any path that evaluates with ansi
    // off; with n > 0 every moment is non-null on in-contract input, so a
    // NULL moment OR a NULL product of non-null moments is exactly the
    // overflow signature. Mirrored by magnitude bounds in the DuckDB SQL.
    val overflow = col("n") > 0 && (
      col("sx").isNull || col("sy").isNull || col("sxy").isNull || col("sxx").isNull ||
        denD.isNull || numSlope.isNull || numIcept.isNull)
    e.groupBy("event_type")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      // den = 0 iff every event of the type shares one hour: slope is
      // undefined there, so the convention is slope 0 / icept = mean —
      // guarded explicitly because Spark double/0 is Inf where DuckDB
      // yields NULL (the engine-divergence class)
      .select(col("event_type"), col("n").cast("long").as("n"),
        when(overflow,
            raise_error(concat(lit("stats_linreg: moment products overflowed "
              + "DECIMAL(38,0) for event_type="), col("event_type"))))
          .when(den === 0.0, 0.0)
          .otherwise(round(numSlope.cast("double") / den, 6)).as("slope_cents_per_hour"),
        when(den === 0.0,
            round(col("sy").cast("double") / col("n").cast("double"), 6))
          .otherwise(round(numIcept.cast("double") / den, 6)).as("icept_cents"))
  }

  /** One-way ANOVA F across event types ("do the k type means differ at
    * all?" — the k-group generalization of [[welchPairs]], the screen run
    * BEFORE k² pairwise tests). Exactness contract: per-type moments (n,
    * Σ, Σ²) accumulate exactly in DECIMAL over cents; each type's
    * between-group term S_g² DIV n_g is per-group TRUNCATED to whole
    * cents² (the [[chisqTypeHour]] trick — a double Σ S_g²/n_g would
    * depend on partition/engine summation order; truncating at cents²
    * rather than micro-units keeps every DIV result inside BIGINT —
    * the µ-scaled variant overflowed at only ~10⁷ events of 10⁴-cent
    * values, measured on the 10× replica — at the cost of ≤ 1 cents²
    * truncation per group, noise against corpus-scale sums of squares
    * and identical in both engines). ssb_c2 = Σ term_g − S² DIV N
    * (clamped at 0: truncation can push an exactly-zero SSB slightly
    * negative), ssw_c2 = Q − Σ term_g (≥ 0: terms truncate down). F is
    * ONE correctly-rounded double division of exact integer products —
    * bit-equal across engines at round(6). Headroom: S_g² ≲ 10³⁸ holds
    * to ~10¹⁵ cent-mass per type; outputs fit BIGINT to ~10¹⁰ events.
    * Scale shape: one hash aggregate over the corpus, one k-row
    * re-aggregate.
    */
  def anovaTypes(events: DataFrame): DataFrame =
    anovaCore(events.select(col("event_type"),
      expr("CAST(round(value * 100) AS DECIMAL(38,0))").as("y")), "stats_anova")

  /** The F machinery over an integral `(event_type, y DECIMAL(38,0))`
    * frame — shared by [[anovaTypes]] (y = cents) and [[leveneTypes]]
    * (y = median-centered absolute deviations). `tag` names the loud
    * guards.
    */
  private def anovaCore(typed: DataFrame, tag: String): DataFrame = {
    val m = typed
      .groupBy("event_type")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("y")).as("s"), sum(col("y") * col("y")).as("q"))
      // The term is DEFERRED to NULL past the bound so the NAMED headroom
      // error below fires rather than a generic ANSI overflow mid-aggregate
      // (ANSI is pinned on by GraftConf — overflow is loud either way, but
      // the named error carries the contract).
      .select(col("n"), col("s"), col("q"),
        when(abs(col("s")) > MaxCentMass, lit(null).cast("decimal(38,0)"))
          .otherwise(expr("CAST((s * s) DIV n AS DECIMAL(38,0))")).as("term"))
    val f = (col("ssb_c2") * (col("nn") - col("k"))).cast("double") /
      (col("ssw_c2") * (col("k") - 1)).cast("double")
    m.agg(sum(col("n")).as("nn"), count(lit(1)).cast("decimal(38,0)").as("k"),
        sum(col("s")).as("ss"), sum(col("q")).as("qq"),
        sum(col("term")).as("t"), max(abs(col("s"))).as("ms"),
        // Per-group null-moment counter (round-10 advice): with ANSI off,
        // a SINGLE group's s/q can overflow to NULL while sum/max over
        // the k-row frame skip NULLs — so qq stays non-null and the ms
        // bound never fires. Count the null groups explicitly; ANSI-on
        // (GraftConf) remains the first line of defense.
        sum(when(col("s").isNull || col("q").isNull, 1).otherwise(0))
          .as("nullg"))
      // Loud-overflow guards ([[MaxCentMass]] contract, mirrored bound-for-
      // bound in sqlAnovaTypes): per-type or total cent-mass beyond the S²
      // headroom, or a Σy² that already overflowed to NULL, must error —
      // never flow a silent NULL into the F chain.
      .select(col("nn"), col("k"),
        when(col("nullg") > 0,
          raise_error(concat(lit(s"$tag: per-group moment overflowed "
            + "DECIMAL(38,0) in "), col("nullg").cast("string"), lit(" group(s)"))))
          .when(col("ms") > MaxCentMass || abs(col("ss")) > MaxCentMass,
          raise_error(concat(lit(s"$tag: cent-mass exceeds the "
            + "DECIMAL(38,0) S^2 headroom (|S| > 3e18); max |S_g|="),
            col("ms").cast("string"))))
          .when(col("nn") > 0 && col("qq").isNull,
            raise_error(lit(s"$tag: sum of squares overflowed DECIMAL(38,0)")))
          .otherwise(greatest(lit(0L).cast("decimal(38,0)"),
            col("t") - expr("CAST((ss * ss) DIV nn AS DECIMAL(38,0))"))).as("ssb_c2"),
        (col("qq") - col("t")).as("ssw_c2"))
      .select(col("nn").cast("long").as("n"), col("k").cast("long").as("k_types"),
        col("ssb_c2").cast("long").as("ssb_c2"),
        col("ssw_c2").cast("long").as("ssw_c2"),
        when(col("ssw_c2") === 0 || col("k") < 2 || col("nn") <= col("k"), 0.0)
          .otherwise(round(f, 6)).as("f_r"))
  }

  /** Kruskal–Wallis H across event types — [[anovaTypes]]'s rank-based
    * (nonparametric) twin, the k-group screen for heavy-tailed values
    * where the mean-based F is itself dragged by outliers. Exactness:
    * tie-averaged ranks ride the eval_auc device (2·r̄ = lo + hi is an
    * integer; lo/hi come from the DISTRIBUTED prefix sum over the
    * distinct-value frame — `GlobalRank.withGlobalPrefixSum`, never a
    * partition-less window), per-type terms S₂²DIV n are per-group
    * truncated integers (the [[anovaTypes]] rule), and the tie-corrected
    * H folds algebraically to ONE final division:
    *   H' = 3(N−1)·(ΣT − N(N+1)²) / (N³ − N − Σ(t³−t)),
    * with T_g = S₂_g² DIV n_g and S₂_g = Σ 2r̄ over the group — both
    * sides exact DECIMAL until the rounded double division. Guards: one
    * type, or every value tied (denominator 0), pin H = 0. Headroom:
    * S₂² ≲ 4N⁴ holds in DECIMAL(38) to ~3·10⁹ events per run. Scale
    * shape: one (value, type) hash agg, the distributed prefix sum over
    * distinct values, one k-row re-aggregate.
    */
  def kruskalTypes(events: DataFrame,
                   maxN: Long = KruskalMaxN): DataFrame = {
    val tc = events
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy("c", "event_type").agg(count(lit(1)).as("n_tc"))
      .localCheckpoint() // feeds the value counts AND the per-type sums
    val vc = tc.groupBy("c").agg(sum(col("n_tc")).as("cnt"))
    // lo = cum − cnt + 1, hi = cum → 2·r̄ = lo + hi = 2·cum − cnt + 1
    val ranked = GlobalRank
      .withGlobalPrefixSum(vc, "c", Seq.empty, "cnt", buckets = GlobalRank.Auto, out = "cum")
      .select(col("c"),
        (col("cum") * 2 - col("cnt") + 1).cast("decimal(38,0)").as("two_rbar"))
    val g = tc.join(ranked, Seq("c"))
      .groupBy("event_type")
      .agg(sum(col("n_tc")).cast("decimal(38,0)").as("n"),
        sum(col("n_tc").cast("decimal(38,0)") * col("two_rbar")).as("s2"))
      .select(col("n"), expr("CAST((s2 * s2) DIV n AS DECIMAL(38,0))").as("t"))
    val ties = vc.agg(coalesce(
      sum(expr("CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt")),
      lit(0L).cast("decimal(38,0)")).as("tie"))
    val denom = (col("nn") * col("nn") * col("nn") - col("nn") - col("tie"))
    val h = (lit(3) * (col("nn") - 1) *
      (col("tt") - col("nn") * (col("nn") + 1) * (col("nn") + 1))).cast("double") /
      denom.cast("double")
    g.agg(sum(col("n")).as("nn"), count(lit(1)).cast("decimal(38,0)").as("k"),
        sum(col("t")).as("tt"))
      .crossJoin(broadcast(ties)) // 1-row tie mass
      .select(col("nn").cast("long").as("n"), col("k").cast("long").as("k_types"),
        // Out-of-headroom inputs must fail LOUDLY, not silently: past the
        // documented ~3·10⁹-event bound the S₂² products overflow
        // DECIMAL(38) to NULL on Spark (non-ANSI) while DuckDB's HUGEINT
        // still holds — a silent cross-engine divergence. The guard never
        // fires on in-contract inputs, so oracle parity is untouched.
        when(col("nn") > maxN,
            raise_error(concat(lit("stats_kruskal: n="), col("nn").cast("string"),
              lit(" exceeds the DECIMAL(38,0) rank-sum headroom (~3e9 events)"))))
          // Per-group truncation (S₂² DIV n) can pull an exactly-zero H a
          // hair negative — clamp to 0 like anovaTypes clamps ssb_c2.
          .when(col("k") < 2 || denom <= 0, 0.0)
          .otherwise(greatest(lit(0.0), round(h, 6))).as("h_r"))
  }

  /** Brown–Forsythe (median-centered Levene) variance-equality screen
    * across event types — the question [[anovaTypes]] does NOT answer: do
    * the type DISPERSIONS differ, not the means? Run before trusting a
    * pooled-variance test; the median-centered variant is the
    * heavy-tail-robust form. Composition of two exactness devices already
    * in the suite: per-type EXACT medians as 2·median integers
    * ([[medianTypes]]' order statistics), then the one-way F over
    *   z = |2·c − median_x2|   (an exact integer per event — both terms
    * ride the doubled cent scale, so no halving ever happens)
    * through the shared [[anovaCore]] DECIMAL machinery and its loud
    * guards. Scale shape: medianTypes' (value, type) agg + one map-side
    * z pass + anova's hash aggregate — nothing new at corpus scale.
    */
  def leveneTypes(events: DataFrame): DataFrame = {
    val med = medianTypes(events)
      .select(col("event_type"), col("median_x2_cents").as("m2"))
    val z = events
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .join(broadcast(med), Seq("event_type")) // enum-bounded type frame
      .select(col("event_type"),
        abs(col("c") * 2 - col("m2")).cast("decimal(38,0)").as("y"))
    anovaCore(z, "stats_levene")
  }

  /** DuckDB mirror of [[leveneTypes]]: the medianTypes CTEs feed z, then
    * the shared F tail.
    */
  def sqlLeveneTypes: String =
    s"""WITH tc AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c,
      |  count(*)::BIGINT AS n_tc FROM events GROUP BY 1, 2),
      |cm AS (SELECT event_type, c,
      |  sum(n_tc) OVER (PARTITION BY event_type ORDER BY c
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |  sum(n_tc) OVER (PARTITION BY event_type) AS nn FROM tc),
      |md AS (SELECT event_type,
      |  (min(CASE WHEN cum >= (nn + 1) // 2 THEN c END)
      |   + min(CASE WHEN cum >= nn // 2 + 1 THEN c END))::BIGINT AS m2
      |  FROM cm GROUP BY 1),
      |z AS (SELECT e.event_type,
      |        abs(CAST(round(e.value * 100) AS HUGEINT) * 2 - md.m2) AS y
      |      FROM events e JOIN md USING (event_type)),
      |m AS (SELECT event_type, count(*)::HUGEINT AS n,
      |        sum(y) AS s, sum(y * y) AS q FROM z GROUP BY 1),
      |${sqlAnovaTail("stats_levene")}""".stripMargin

  /** Mann–Whitney U for every PAIR of event types — [[welchPairs]]'s
    * rank-based (nonparametric) twin, exactly as [[kruskalTypes]] is
    * [[anovaTypes]]'s: the two-sample location test that survives heavy
    * tails. Ranks are computed WITHIN each pair (not globally), so the
    * distinct (value, type) frame is joined to the exploded 2-row-per-pair
    * membership grid (an EQUI join; the k² pair build itself runs on the
    * k-row type frame — the stats_ttest whitelist class) and tie-averaged
    * ranks ride the kruskal device: 2·r̄ = 2·cum − cnt + 1 over the
    * per-pair prefix sum of the distinct-value frame.
    *
    * Exactness: 2U_a = S₂_a − n_a(n_a+1) is an exact integer (S₂ sums in
    * DECIMAL(38,0)); the tie-corrected z is then the sanctioned short
    * IEEE chain (casts of exact integers, +, −, ×, /, sqrt, round),
    * mirrored term-for-term:
    *   z = (2U_a − n_a·n_b) / (2·√(n_a·n_b/12 · ((N+1) − Σ(t³−t)/(N(N−1)))))
    * All-tied pairs (variance 0) pin z = 0. Same [[KruskalMaxN]] loud
    * guard (rank sums square past DECIMAL(38) near ~3·10⁹ events).
    *
    * Scale shape: one (value, type) hash agg over the corpus; everything
    * after runs on pair × distinct-value frames (pairs are enum-bounded,
    * values cents-bounded) — windows and joins there cost nothing at any
    * corpus size.
    */
  def mannWhitneyPairs(events: DataFrame,
                       maxN: Long = KruskalMaxN): DataFrame = {
    val tc = events
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy("event_type", "c").agg(count(lit(1)).as("n_tc"))
      .localCheckpoint() // feeds the type frame and the pair-tagged counts
    val types = tc.select("event_type").distinct()
    val pairs = types.as("l").join(types.as("r"),
        col("l.event_type") < col("r.event_type"))
      .select(col("l.event_type").as("pa"), col("r.event_type").as("pb"))
    val ptc = pairs
      .select(col("pa"), col("pb"),
        explode(array(col("pa"), col("pb"))).as("member"))
      .join(tc, col("member") === col("event_type"))
      .select(col("pa"), col("pb"), col("member"), col("c"), col("n_tc"))
      .localCheckpoint() // feeds the value counts AND the per-member sums
    val vc = ptc.groupBy("pa", "pb", "c").agg(sum(col("n_tc")).as("cnt"))
      .localCheckpoint() // feeds the rank window AND the tie mass
    val w = Window.partitionBy("pa", "pb").orderBy("c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = vc
      .withColumn("two_rbar",
        (sum(col("cnt")).over(w) * 2 - col("cnt") + 1).cast("decimal(38,0)"))
    val g = ptc.join(ranked.select("pa", "pb", "c", "two_rbar"), Seq("pa", "pb", "c"))
      .groupBy("pa", "pb", "member")
      .agg(sum(col("n_tc")).cast("decimal(38,0)").as("n"),
        sum(col("n_tc").cast("decimal(38,0)") * col("two_rbar")).as("s2"))
    val ties = vc.groupBy("pa", "pb")
      .agg(sum(expr("CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt")).as("tie"))
    val a = g.filter(col("member") === col("pa"))
      .select(col("pa"), col("pb"), col("n").as("na"), col("s2").as("s2a"))
    val b = g.filter(col("member") === col("pb"))
      .select(col("pa"), col("pb"), col("n").as("nb"))
    val nn = col("na") + col("nb")
    val nanb = col("na") * col("nb")
    val twoUa = col("s2a") - col("na") * (col("na") + 1)
    val varE = nanb.cast("double") / lit(12.0) *
      ((nn + 1).cast("double") -
        col("tie").cast("double") / (nn.cast("double") * (nn - 1).cast("double")))
    a.join(b, Seq("pa", "pb")).join(ties, Seq("pa", "pb"))
      .select(col("pa").as("type_a"), col("pb").as("type_b"),
        col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
        when(nn > maxN,
            raise_error(lit("stats_mannwhitney: n exceeds the DECIMAL(38,0) "
              + "rank-sum headroom (~3e9 events)")))
          .otherwise(twoUa.cast("long")).as("two_u_a"),
        when(varE <= 0.0, 0.0)
          .otherwise(round((twoUa - nanb).cast("double")
            / (lit(2.0) * sqrt(varE)), 6)).as("z_r"))
      .orderBy("type_a", "type_b")
  }

  /** DuckDB mirror of [[mannWhitneyPairs]], term-for-term (same IEEE op
    * order in the z chain; same loud guard).
    */
  def sqlMannWhitneyPairs: String =
    s"""WITH tc AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c,
      |  count(*)::HUGEINT AS n_tc FROM events GROUP BY 1, 2),
      |ty AS (SELECT DISTINCT event_type FROM tc),
      |pr AS (SELECT l.event_type AS pa, r.event_type AS pb
      |       FROM ty l JOIN ty r ON l.event_type < r.event_type),
      |mem AS (SELECT pa, pb, unnest([pa, pb]) AS member FROM pr),
      |ptc AS (SELECT m.pa, m.pb, m.member, tc.c, tc.n_tc
      |        FROM mem m JOIN tc ON m.member = tc.event_type),
      |vc AS (SELECT pa, pb, c, sum(n_tc) AS cnt FROM ptc GROUP BY 1, 2, 3),
      |rk AS (SELECT pa, pb, c,
      |         2 * sum(cnt) OVER (PARTITION BY pa, pb ORDER BY c
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           - cnt + 1 AS two_rbar FROM vc),
      |g AS (SELECT ptc.pa, ptc.pb, ptc.member, sum(ptc.n_tc) AS n,
      |        sum(ptc.n_tc * rk.two_rbar) AS s2
      |      FROM ptc JOIN rk USING (pa, pb, c) GROUP BY 1, 2, 3),
      |tie AS (SELECT pa, pb, sum(cnt * cnt * cnt - cnt) AS tie
      |        FROM vc GROUP BY 1, 2),
      |ab AS (SELECT a.pa, a.pb, a.n AS na, a.s2 AS s2a, b.n AS nb, t.tie
      |       FROM (SELECT * FROM g WHERE member = pa) a
      |       JOIN (SELECT * FROM g WHERE member = pb) b USING (pa, pb)
      |       JOIN tie t USING (pa, pb))
      |SELECT pa AS type_a, pb AS type_b, na::BIGINT AS n_a, nb::BIGINT AS n_b,
      |  CASE WHEN na + nb > $KruskalMaxN
      |       THEN error('stats_mannwhitney: n exceeds the DECIMAL(38,0) rank-sum headroom (~3e9 events)')
      |       ELSE (s2a - na * (na + 1))::BIGINT END AS two_u_a,
      |  CASE WHEN (na * nb)::DOUBLE / 12 * ((na + nb + 1)::DOUBLE
      |         - tie::DOUBLE / ((na + nb)::DOUBLE * (na + nb - 1)::DOUBLE)) <= 0
      |       THEN 0.0
      |       ELSE round((s2a - na * (na + 1) - na * nb)::DOUBLE
      |         / (2 * sqrt((na * nb)::DOUBLE / 12 * ((na + nb + 1)::DOUBLE
      |           - tie::DOUBLE / ((na + nb)::DOUBLE * (na + nb - 1)::DOUBLE)))), 6)
      |       END AS z_r
      |FROM ab ORDER BY type_a, type_b""".stripMargin

  /** EXACT per-type median of event value — what `agg_approx_percentile`
    * approximates, computed exactly and distributed: the sanity anchor a
    * pipeline owner runs when an approx-sketch number looks off. Exactness
    * contract (the eval_auc/kruskal device): medians ship as 2·median in
    * whole cents — lo + hi of the two middle order statistics, an INTEGER
    * for any n — so no engine ever divides or averages a double. The
    * order statistics come from a cumulative count over the DISTINCT
    * (type, cent-value) frame: lo = min value with cum ≥ ⌈n/2⌉, hi = min
    * value with cum ≥ ⌊n/2⌋ + 1.
    *
    * Scale shape: one (type, value) hash aggregate over the corpus
    * (map-side combinable), then windows/aggregates on the distinct-value
    * frame only — value cardinality is fixture-bounded (cents), NEVER
    * corpus-proportional, so the window costs nothing at any corpus size.
    */
  def medianTypes(events: DataFrame): DataFrame = {
    val tc = events
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy("event_type", "c").agg(count(lit(1)).as("n_tc"))
    val w = Window.partitionBy("event_type").orderBy("c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = tc
      .withColumn("cum", sum(col("n_tc")).over(w))
      .withColumn("nn", sum(col("n_tc")).over(Window.partitionBy("event_type")))
    val kLo = call_function("div", col("nn") + 1, lit(2L))
    val kHi = call_function("div", col("nn"), lit(2L)) + 1
    cum.groupBy("event_type")
      .agg(max(col("nn")).as("n"),
        min(when(col("cum") >= kLo, col("c"))).as("lo"),
        min(when(col("cum") >= kHi, col("c"))).as("hi"))
      .select(col("event_type"), col("n"),
        (col("lo") + col("hi")).as("median_x2_cents"))
      .orderBy("event_type")
  }

  /** DuckDB mirror of [[medianTypes]] — the same order-statistic
    * construction, deliberately NOT DuckDB's `median()` (whose
    * interpolation semantics are the engine-divergence class).
    */
  def sqlMedianTypes: String =
    """WITH tc AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c,
      |  count(*)::BIGINT AS n_tc FROM events GROUP BY 1, 2),
      |cm AS (SELECT event_type, c,
      |  sum(n_tc) OVER (PARTITION BY event_type ORDER BY c
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |  sum(n_tc) OVER (PARTITION BY event_type) AS nn FROM tc)
      |SELECT event_type, max(nn)::BIGINT AS n,
      |  (min(CASE WHEN cum >= (nn + 1) // 2 THEN c END)
      |   + min(CASE WHEN cum >= nn // 2 + 1 THEN c END))::BIGINT
      |    AS median_x2_cents
      |FROM cm GROUP BY 1 ORDER BY 1""".stripMargin

  /** DuckDB mirror of [[kruskalTypes]] — including the loud [[KruskalMaxN]]
    * guard so both engines refuse out-of-headroom input identically. */
  def sqlKruskalTypes: String =
    s"""WITH e AS (SELECT event_type,
      |  CAST(round(value * 100) AS BIGINT) AS c FROM events),
      |tc AS (SELECT c, event_type, count(*)::HUGEINT AS n_tc FROM e GROUP BY 1, 2),
      |vc AS (SELECT c, sum(n_tc) AS cnt FROM tc GROUP BY 1),
      |r AS (SELECT c,
      |  2 * sum(cnt) OVER (ORDER BY c
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt + 1 AS two_rbar
      |  FROM vc),
      |g AS (SELECT tc.event_type, sum(tc.n_tc) AS n,
      |        sum(tc.n_tc * r.two_rbar) AS s2
      |      FROM tc JOIN r USING (c) GROUP BY 1),
      |t AS (SELECT n, (s2 * s2) // n AS t FROM g),
      |a AS (SELECT sum(n) AS nn, count(*)::HUGEINT AS k, sum(t) AS tt FROM t),
      |tie AS (SELECT coalesce(sum(cnt * cnt * cnt - cnt), 0) AS x FROM vc)
      |SELECT nn::BIGINT AS n, k::BIGINT AS k_types,
      |  CASE WHEN nn > $KruskalMaxN
      |       THEN error('stats_kruskal: n exceeds the DECIMAL(38,0) rank-sum headroom (~3e9 events)')
      |       WHEN k < 2 OR (nn * nn * nn - nn - x) <= 0 THEN 0.0
      |       ELSE greatest(0.0,
      |         round((3 * (nn - 1) * (tt - nn * (nn + 1) * (nn + 1)))::DOUBLE
      |              / (nn * nn * nn - nn - x)::DOUBLE, 6)) END AS h_r
      |FROM a, tie""".stripMargin

  /** DuckDB mirror of [[anovaTypes]] — including the loud-overflow guards
    * at the SAME [[MaxCentMass]] / 10³⁸ bounds (HUGEINT holds to ~1.7·10³⁸,
    * so without the explicit `error()` the 10³⁸..1.7·10³⁸ window would
    * silently diverge from Spark's NULL-on-overflow).
    */
  def sqlAnovaTypes: String =
    s"""WITH m AS (SELECT event_type,
      |  count(*)::HUGEINT AS n,
      |  sum(CAST(round(value * 100) AS HUGEINT)) AS s,
      |  sum(CAST(round(value * 100) AS HUGEINT)
      |      * CAST(round(value * 100) AS HUGEINT)) AS q
      |  FROM events GROUP BY 1),
      |${sqlAnovaTail("stats_anova")}""".stripMargin

  /** The F tail over a CTE `m(event_type, n, s, q)` in scope — shared by
    * [[sqlAnovaTypes]] and the levene mirror; `tag` names the guards.
    */
  private def sqlAnovaTail(tag: String): String =
    s"""t AS (SELECT n, s,
      |        CASE WHEN q >= ${"1" + "0" * 38}::HUGEINT
      |             THEN error('$tag: sum of squares overflowed DECIMAL(38,0)')
      |             ELSE q END AS q,
      |        CASE WHEN abs(s) > $MaxCentMass
      |             THEN error('$tag: cent-mass exceeds the DECIMAL(38,0) S^2 headroom')
      |             ELSE (s * s) // n END AS term FROM m),
      |a AS (SELECT sum(n) AS nn, count(*)::HUGEINT AS k,
      |        sum(s) AS ss, sum(q) AS qq, sum(term) AS t FROM t),
      |b AS (SELECT nn, k,
      |        CASE WHEN abs(ss) > $MaxCentMass
      |             THEN error('$tag: total cent-mass exceeds the DECIMAL(38,0) S^2 headroom')
      |             ELSE greatest(0::HUGEINT, t - (ss * ss) // nn) END AS ssb_c2,
      |        CASE WHEN qq >= ${"1" + "0" * 38}::HUGEINT
      |             THEN error('$tag: sum of squares overflowed DECIMAL(38,0)')
      |             ELSE qq - t END AS ssw_c2 FROM a)
      |SELECT nn::BIGINT AS n, k::BIGINT AS k_types,
      |  ssb_c2::BIGINT AS ssb_c2, ssw_c2::BIGINT AS ssw_c2,
      |  CASE WHEN ssw_c2 = 0 OR k < 2 OR nn <= k THEN 0.0
      |       ELSE round((ssb_c2 * (nn - k))::DOUBLE
      |              / (ssw_c2 * (k - 1))::DOUBLE, 6) END AS f_r
      |FROM b""".stripMargin

  /** Cohen's d effect size for every event-type pair — the magnitude
    * companion the significance layer (welch t, mann-whitney) reports
    * beside: HOW far apart two type's value distributions sit in pooled-SD
    * units. Same exactness contract as [[welchPairs]]: per-type integer
    * cent moments in DECIMAL, then a short chain of correctly-rounded
    * IEEE ops — (n·ss − s²)/n is each type's exact (n−1)·variance
    * numerator, pooled over n_a + n_b − 2, one sqrt, one division,
    * round 6. Degenerate pairs (zero pooled variance, or two singleton
    * groups) pin d = 0. Scale shape: ONE corpus hash aggregate, then the
    * #types² self-join of the k-row frame (the stats_ttest whitelist
    * class).
    */
  def cohensDPairs(events: DataFrame): DataFrame = {
    val m = events
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS DECIMAL(38,0))").as("y"))
      .groupBy("event_type")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("y")).as("s"), sum(col("y") * col("y")).as("ss"))
      .localCheckpoint() // #types rows feed both sides of the pair join
    def side(tag: String) = m.select(
      col("event_type").as(s"type_$tag"), col("n").as(s"n_$tag"),
      col("s").as(s"s_$tag"), col("ss").as(s"ss_$tag"))
    def mean(t: String) = col(s"s_$t").cast("double") / col(s"n_$t").cast("double")
    // (n−1)·sample-variance = (n·ss − s²)/n — exact DECIMAL numerator over
    // an exact denominator, one double division per side
    def m2(t: String) =
      (col(s"n_$t") * col(s"ss_$t") - col(s"s_$t") * col(s"s_$t")).cast("double") /
        col(s"n_$t").cast("double")
    val dof = (col("n_a") + col("n_b") - 2).cast("double")
    val pooled = (m2("a") + m2("b")) / dof
    side("a").join(side("b"), col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"),
        col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
        when(col("n_a") + col("n_b") <= 2, 0.0)
          .when(pooled === 0.0, 0.0)
          .otherwise(round((mean("a") - mean("b")) / sqrt(pooled), 6))
          .as("d_r"))
      .orderBy("type_a", "type_b")
  }

  /** DuckDB mirror of [[cohensDPairs]], term-for-term. */
  def sqlCohensDPairs: String =
    """WITH m AS (SELECT event_type, count(*)::HUGEINT AS n,
      |    sum(CAST(round(value * 100) AS HUGEINT)) AS s,
      |    sum(CAST(round(value * 100) AS HUGEINT)
      |        * CAST(round(value * 100) AS HUGEINT)) AS ss
      |  FROM events GROUP BY 1)
      |SELECT a.event_type AS type_a, b.event_type AS type_b,
      |  a.n::BIGINT AS n_a, b.n::BIGINT AS n_b,
      |  CASE WHEN a.n + b.n <= 2 THEN 0.0
      |       WHEN ((a.n * a.ss - a.s * a.s)::DOUBLE / a.n::DOUBLE
      |             + (b.n * b.ss - b.s * b.s)::DOUBLE / b.n::DOUBLE)
      |            / (a.n + b.n - 2)::DOUBLE = 0.0 THEN 0.0
      |       ELSE round(
      |         (a.s::DOUBLE / a.n::DOUBLE - b.s::DOUBLE / b.n::DOUBLE)
      |         / sqrt(((a.n * a.ss - a.s * a.s)::DOUBLE / a.n::DOUBLE
      |                 + (b.n * b.ss - b.s * b.s)::DOUBLE / b.n::DOUBLE)
      |                / (a.n + b.n - 2)::DOUBLE), 6) END AS d_r
      |FROM m a JOIN m b ON a.event_type < b.event_type
      |ORDER BY 1, 2""".stripMargin

  /** Spearman rank correlation (tie-averaged Σd² estimator) between two
    * integral per-row features of a frame — the monotone-association
    * screen (Pearson on RANKS), robust to the heavy tails that drag
    * [[linreg]]. Exactness: tie-averaged ranks ride the eval_auc device
    * (2·r̄ = 2·cum − cnt + 1 over the DISTINCT-VALUE frame via the
    * distributed prefix sum — never a partition-less window), the
    * difference sum D4 = Σ(2r̄x − 2r̄y)² accumulates exactly in
    * DECIMAL(38,0), and ρ = 1 − 3·D4 / (2n(n²−1)) is one double division
    * of exact integers, round 6. With ties this is the classical
    * average-rank Σd² estimator (not the full Pearson-on-ranks tie
    * correction) — deterministic and documented. n ≤ 1 or a zero
    * denominator pins ρ = 0. Headroom: D4 ≤ 4n³ holds in DECIMAL(38) to
    * ~10¹¹ rows. Scale shape: one corpus pass to the (x, y) frame, two
    * distinct-VALUE prefix sums (value-bounded frames), two equi-joins
    * back, one scalar aggregate.
    */
  def spearman(frame: DataFrame, xCol: String, yCol: String): DataFrame = {
    val base = frame.select(col(xCol).as("x"), col(yCol).as("y"))
      .localCheckpoint() // feeds two rank frames + the final join-back
    def twoRbar(c: String): DataFrame = {
      val vc = base.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
      GlobalRank
        .withGlobalPrefixSum(vc, c, Seq.empty, "cnt", buckets = GlobalRank.Auto,
          out = "cum")
        .select(col(c), (col("cum") * 2 - col("cnt") + 1)
          .cast("decimal(38,0)").as(s"r_$c"))
    }
    val ranked = base
      .join(twoRbar("x"), Seq("x")).join(twoRbar("y"), Seq("y"))
    val rho = lit(1.0) -
      (col("d4") * 3).cast("double") /
        (col("n") * (col("n") * col("n") - 1) * 2).cast("double")
    ranked
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum((col("r_x") - col("r_y")) * (col("r_x") - col("r_y"))).as("d4"))
      .select(col("n").cast("long").as("n"),
        when(col("n") <= 1, 0.0).otherwise(round(rho, 6)).as("rho_r"))
  }

  /** DuckDB mirror of [[spearman]] over a CTE `base(x, y)` in scope. */
  def sqlSpearmanTail: String =
    """rx AS (SELECT x, (2 * sum(cnt) OVER (ORDER BY x) - cnt + 1)::HUGEINT AS r_x
      |       FROM (SELECT x, count(*)::BIGINT AS cnt FROM base GROUP BY 1)),
      |ry AS (SELECT y, (2 * sum(cnt) OVER (ORDER BY y) - cnt + 1)::HUGEINT AS r_y
      |       FROM (SELECT y, count(*)::BIGINT AS cnt FROM base GROUP BY 1)),
      |j AS (SELECT r_x, r_y FROM base JOIN rx USING (x) JOIN ry USING (y)),
      |a AS (SELECT count(*)::HUGEINT AS n,
      |        sum((r_x - r_y) * (r_x - r_y)) AS d4 FROM j)
      |SELECT n::BIGINT AS n,
      |  CASE WHEN n <= 1 THEN 0.0
      |       ELSE round(1.0 - (d4 * 3)::DOUBLE
      |              / (n * (n * n - 1) * 2)::DOUBLE, 6) END AS rho_r
      |FROM a""".stripMargin

  /** Two-sample Kolmogorov–Smirnov statistic for every event-type pair —
    * the distribution-shape screen beside [[mannWhitneyPairs]] (U sees
    * location shifts; KS sees ANY CDF divergence: spread, tails,
    * bimodality). Exactness: D = max_c |F_a(c) − F_b(c)| is evaluated on
    * the merged distinct-CENT frame with cross-multiplied integer CDFs —
    * d_num = max |cum_a·n_b − cum_b·n_a| is an exact DECIMAL(38,0)
    * (headroom to ~10¹⁸ events), and d_r = d_num/(n_a·n_b) is one double
    * division, round 6. Scale shape: one corpus (type, cent) hash
    * aggregate; pairs × merged-value frames are (k² × distinct cents) —
    * value-bounded, never corpus-sized; the per-pair cumulative window
    * partitions on the pair key over that bounded frame. The pair build
    * is the k-row stats_ttest whitelist class; pair membership reaches
    * the cell frame through an EQUI join on event_type (exploded side
    * tags, never an OR predicate).
    */
  def ksPairs(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tc = events
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy("event_type", "c").agg(count(lit(1)).as("n"))
      .localCheckpoint() // feeds totals AND the per-pair merge
    val tot = tc.groupBy("event_type").agg(sum(col("n")).as("nt"))
    val pairs = tot.as("a").join(tot.as("b"),
        col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("ta"), col("b.event_type").as("tb"),
        col("a.nt").as("n_a"), col("b.nt").as("n_b"))
    val sides = pairs.select(col("ta"), col("tb"),
      explode(array(col("ta"), col("tb"))).as("event_type"))
    val cells = sides.join(tc, Seq("event_type"))
      .groupBy("ta", "tb", "c")
      .agg(sum(when(col("event_type") === col("ta"), col("n")).otherwise(0L))
          .as("da"),
        sum(when(col("event_type") === col("tb"), col("n")).otherwise(0L))
          .as("db"))
    val w = Window.partitionBy("ta", "tb").orderBy("c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells.select(col("ta"), col("tb"), col("c"),
      sum("da").over(w).as("ca"), sum("db").over(w).as("cb"))
    cum.join(pairs, Seq("ta", "tb"))
      .groupBy(col("ta").as("type_a"), col("tb").as("type_b"),
        col("n_a"), col("n_b"))
      .agg(max(abs(col("ca").cast("decimal(38,0)") * col("n_b")
        - col("cb").cast("decimal(38,0)") * col("n_a"))).as("d_num"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        // BIGINT output contract (headroom: d_num <= n_a*n_b, exact to
        // ~3e9 events per side; past it the ANSI cast and the DuckDB
        // ::BIGINT cast BOTH error loudly at the same bound)
        col("d_num").cast("long").as("d_num"),
        round(col("d_num").cast("double") /
          (col("n_a").cast("decimal(38,0)") * col("n_b")).cast("double"), 6)
          .as("d_r"))
      .orderBy("type_a", "type_b")
  }

  /** Expected leading-digit shares, ppm: floor(log10(1 + 1/d) · 10⁶) —
    * PUBLIC constants of Benford's law, precomputed as query literals
    * (log10 itself is banned from oracle contracts; a fixed 9-value table
    * is deterministic by construction). */
  val BenfordPpm: Seq[Long] =
    Seq(301029L, 176091L, 124938L, 96910L, 79181L, 66946L, 57991L, 51152L, 45757L)

  /** Benford leading-digit screen over positive event values — the
    * classic data-quality / fabricated-data tripwire: organic magnitude
    * data follows log10(1 + 1/d); uniform or hand-entered data does not.
    * Exactness: leading digit via string head of the integer cents (both
    * engines render positive BIGINTs identically), observed shares in
    * integer ppm by DIV, expected shares from the [[BenfordPpm]] literal
    * table, deviation = |obs − exp| exact. Scale shape: one corpus hash
    * aggregate to 9 cells; the digit extraction is per-row codegen.
    */
  def benford(events: DataFrame): DataFrame = {
    val c = events.select(expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .filter(col("c") > 0)
    val d = c.select(substring(col("c").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
      .localCheckpoint() // 9 rows feed the total AND the share rows
    val tot = d.agg(sum(col("n")).as("nn"))
    val expTable = BenfordPpm.zipWithIndex
      .map { case (p, i) => (i + 1).toLong -> p }
    val expCol = expTable.foldLeft(lit(0L)) { case (acc, (dig, p)) =>
      when(col("digit") === dig, lit(p)).otherwise(acc)
    }
    d.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        expr("(n * 1000000) div nn").as("obs_ppm"), expCol.as("exp_ppm"))
      .withColumn("dev_ppm", abs(col("obs_ppm") - col("exp_ppm")))
      .orderBy("digit")
  }

  /** DuckDB mirror of [[benford]], term-for-term. */
  def sqlBenford: String = {
    val cases = BenfordPpm.zipWithIndex
      .map { case (p, i) => s"WHEN ${i + 1} THEN $p" }.mkString(" ")
    s"""WITH c AS (SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events
       |           WHERE CAST(round(value * 100) AS BIGINT) > 0),
       |d AS (SELECT CAST(substr(c::VARCHAR, 1, 1) AS BIGINT) AS digit,
       |        count(*)::BIGINT AS n FROM c GROUP BY 1),
       |t AS (SELECT sum(n)::BIGINT AS nn FROM d)
       |SELECT digit, n, ((n * 1000000) // nn)::BIGINT AS obs_ppm,
       |  (CASE digit $cases ELSE 0 END)::BIGINT AS exp_ppm,
       |  abs(((n * 1000000) // nn) - CASE digit $cases ELSE 0 END)::BIGINT
       |    AS dev_ppm
       |FROM d, t ORDER BY digit""".stripMargin
  }

  /** DuckDB mirror of [[ksPairs]], term-for-term. */
  def sqlKsPairs: String =
    """WITH tc AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c,
      |    count(*)::BIGINT AS n FROM events GROUP BY 1, 2),
      |tot AS (SELECT event_type, sum(n)::BIGINT AS nt FROM tc GROUP BY 1),
      |pairs AS (SELECT a.event_type AS ta, b.event_type AS tb,
      |    a.nt AS n_a, b.nt AS n_b
      |  FROM tot a JOIN tot b ON a.event_type < b.event_type),
      |sides AS (SELECT ta, tb, unnest([ta, tb]) AS event_type FROM pairs),
      |cells AS (SELECT ta, tb, c,
      |    sum(CASE WHEN s.event_type = ta THEN n ELSE 0 END)::BIGINT AS da,
      |    sum(CASE WHEN s.event_type = tb THEN n ELSE 0 END)::BIGINT AS db
      |  FROM sides s JOIN tc USING (event_type) GROUP BY 1, 2, 3),
      |cum AS (SELECT ta, tb, c,
      |    sum(da) OVER (PARTITION BY ta, tb ORDER BY c
      |      ROWS UNBOUNDED PRECEDING)::BIGINT AS ca,
      |    sum(db) OVER (PARTITION BY ta, tb ORDER BY c
      |      ROWS UNBOUNDED PRECEDING)::BIGINT AS cb
      |  FROM cells),
      |d AS (SELECT ta AS type_a, tb AS type_b, n_a, n_b,
      |    max(abs(ca::HUGEINT * n_b - cb::HUGEINT * n_a)) AS d_num
      |  FROM cum JOIN pairs USING (ta, tb) GROUP BY 1, 2, 3, 4)
      |SELECT type_a, type_b, n_a, n_b,
      |  d_num::BIGINT AS d_num,
      |  round(d_num::DOUBLE / (n_a::HUGEINT * n_b)::DOUBLE, 6) AS d_r
      |FROM d ORDER BY 1, 2""".stripMargin

  /** Per-user burstiness histogram — the Goh–Barabási coefficient
    * B = (σ − μ)/(σ + μ) of each user's inter-event gaps (B → −1
    * metronome bots, B ≈ 0 Poisson, B → 1 heavy bursts), bucketed into
    * 10 bins over [−1, 1]. The scalar companion to
    * [[Interarrival.histogram]]'s spectrum (its Scaladoc names this key).
    * Exactness: gaps are exact integer MICROSECONDS (`ts DIV 1000` ≡
    * DuckDB `epoch_us`, ties broken on event_id); per-user S = Σgap and
    * n²σ² = n·Σgap² − S² are exact DECIMAL; B = (sqrt(m2) − S)/(sqrt(m2)
    * + S) is then casts + sqrt + one division (all correctly rounded),
    * round 6; the bin edge floor((B_r + 1) · 5) is a floor of an IEEE
    * product of the shared rounded value. Degenerate users (all gaps
    * equal AND zero — σ = μ = 0) pin B = 0. Headroom: S ≤ corpus span in
    * µs (~3·10¹² per month-scale fixture) stays far under 2⁵³ doubles;
    * m2 in DECIMAL(38). Scale shape: ONE user-partitioned lag window
    * (the user axis grows with the corpus — never global), one user hash
    * aggregate, one ≤10-bucket re-aggregate.
    */
  def burstiness(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val us = call_function("div", col("ts"), lit(1000L))
    val gaps = events.select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap_us", us - lag(us, 1).over(w))
      .filter(col("gap_us").isNotNull)
    val per = gaps.groupBy("user_id")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("gap_us")).cast("decimal(38,0)").as("s"),
        sum(col("gap_us").cast("decimal(38,0)") * col("gap_us")).as("q"))
      .select(col("user_id"),
        (col("n") * col("q") - col("s") * col("s")).as("m2"), col("s"))
    val b = when(col("m2") === 0 && col("s") === 0, 0.0)
      .otherwise(round(
        (sqrt(col("m2").cast("double")) - col("s").cast("double")) /
          (sqrt(col("m2").cast("double")) + col("s").cast("double")), 6))
    per.select(least(lit(9L), floor((b + 1.0) * 5.0).cast("long")).as("bucket"),
        b.as("b_r"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_users"),
        min(col("b_r")).as("b_min_r"), max(col("b_r")).as("b_max_r"))
      .orderBy("bucket")
  }

  /** DuckDB mirror of [[burstiness]], term-for-term. */
  def sqlBurstiness: String =
    """WITH g AS (SELECT user_id,
      |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      |  FROM events),
      |p AS (SELECT user_id, count(*)::HUGEINT AS n,
      |        sum(gap_us)::HUGEINT AS s,
      |        sum(gap_us::HUGEINT * gap_us) AS q
      |      FROM g WHERE gap_us IS NOT NULL GROUP BY 1),
      |b AS (SELECT user_id,
      |        CASE WHEN n * q - s * s = 0 AND s = 0 THEN 0.0
      |             ELSE round((sqrt((n * q - s * s)::DOUBLE) - s::DOUBLE)
      |                    / (sqrt((n * q - s * s)::DOUBLE) + s::DOUBLE), 6)
      |        END AS b_r FROM p)
      |SELECT least(9, floor((b_r + 1.0) * 5.0))::BIGINT AS bucket,
      |  count(*)::BIGINT AS n_users,
      |  min(b_r) AS b_min_r, max(b_r) AS b_max_r
      |FROM b GROUP BY 1 ORDER BY 1""".stripMargin
}
