package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._


/** Deterministic Poisson bootstrap: per-group confidence intervals for the
  * mean without sampling randomness. Classic bootstrap resampling draws
  * each row Binomial(n, 1/n) ≈ Poisson(1) times per replica; here the draw
  * is the Poisson(1) inverse CDF applied to a PORTABLE per-(row, replica)
  * hash (three Lehmer/MINSTD rounds of plain integer arithmetic, identical
  * in Spark and DuckDB), so the whole CI is a pure function of the data —
  * replayable, oracle-checkable, and identical across cluster topologies.
  *
  * Scale shape: one B-way generate (the known ×B bootstrap cost, B
  * bounded), one (group, replica)-keyed aggregate, then a per-group window
  * over exactly B rows to pick the percentile ranks — never a corpus-sized
  * window. All arithmetic exact integers (cents, milli-cents via DIV);
  * ranks use the nearest-lower-rank convention shared with
  * quality_report/agg_winsorized.
  */
object Bootstrap {

  val B = 100

  /** Poisson(1) CDF in ppm: P(X ≤ k) for k = 0..4; the tail (≈ 0.06%)
    * caps at weight 5.
    */
  val CumPpm: Seq[Long] = Seq(367879L, 735759L, 919699L, 981012L, 996340L)

  def lowRank(b: Int): Long = (b - 1L) * 25 / 1000 + 1
  def highRank(b: Int): Long = (b - 1L) * 975 / 1000 + 1

  /** Lehmer modulus/multipliers: MINSTD over the Mersenne prime 2^31−1.
    * Three mixing rounds of pure integer arithmetic (every product
    * < 2^47, far from BIGINT overflow in either engine) replace a
    * per-(row, replica) md5 — the md5 form measured 22 s at sf0.1 for the
    * 10M draws; this one is codegen-friendly column math.
    */
  val LehmerP = 2147483647L
  val LehmerA = 48271L
  val LehmerB = 16807L

  /** Poisson(1) weight of `key` in replica `b` (columns). */
  def weight(key: Column, b: Column): Column = {
    val h1 = pmod(pmod(key, lit(LehmerP)) * LehmerA + (b + 1) * LehmerB, lit(LehmerP))
    val h3 = pmod(pmod(h1 * LehmerA, lit(LehmerP)) * LehmerA, lit(LehmerP))
    val u = pmod(h3, lit(1000000L))
    CumPpm.zipWithIndex.foldRight(lit(CumPpm.size.toLong)) {
      case ((t, k), acc) => when(u < t, k.toLong).otherwise(acc)
    }
  }

  /** DuckDB twin of [[weight]] over SQL expressions (keys nonnegative, so
    * `%` and pmod agree).
    */
  def sqlWeight(keyE: String, bE: String): String = {
    val h1 = s"((($keyE) % $LehmerP) * $LehmerA + (($bE) + 1) * $LehmerB) % $LehmerP"
    val h3 = s"((($h1) * $LehmerA % $LehmerP) * $LehmerA) % $LehmerP"
    val u = s"(($h3) % 1000000)"
    CumPpm.zipWithIndex.foldRight(s"${CumPpm.size}") { case ((t, k), acc) =>
      s"CASE WHEN $u < $t THEN $k ELSE $acc END"
    }
  }

  /** Per-group mean (milli-cents) with the [lo95, hi95] percentile
    * bootstrap interval. `df` needs `groupCol`, `idCol` (the resample
    * unit) and an integer `cents` column.
    */
  def meanCi(df0: DataFrame, groupCol: String, idCol: String,
             b: Int = B): DataFrame = {
    val df = df0.localCheckpoint() // feeds the replica fan-out AND the full mean
    val rep = df.select(col(groupCol), col(idCol), col("cents"),
        explode(sequence(lit(0), lit(b - 1))).as("rep"))
      .withColumn("w", weight(col(idCol), col("rep")))
    val means = rep.groupBy(col(groupCol), col("rep"))
      .agg(sum(col("w")).as("sw"), sum(col("w") * col("cents")).as("swx"))
      .select(col(groupCol),
        when(col("sw") === 0, 0L)
          .otherwise(expr("swx * 1000 DIV sw")).as("mean_milli"))
    val ranked = means.withColumn("rnk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(groupCol).orderBy(col("mean_milli"))).cast("long"))
      .localCheckpoint() // groups×B rows feed the lo AND hi picks
    val lo = ranked.filter(col("rnk") === lowRank(b))
      .select(col(groupCol), col("mean_milli").as("lo95_milli"))
    val hi = ranked.filter(col("rnk") === highRank(b))
      .select(col(groupCol), col("mean_milli").as("hi95_milli"))
    val full = df.groupBy(groupCol)
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
      .select(col(groupCol), col("n"), expr("s * 1000 DIV n").as("mean_milli"))
    full.join(lo, Seq(groupCol)).join(hi, Seq(groupCol))
      .orderBy(groupCol)
  }

  /** DuckDB mirror over the `events` view, grouped by event_type. */
  def sqlMeanCi(b: Int = B): String =
    s"""WITH base AS (SELECT event_type, event_id,
       |  CAST(round(value * 100) AS BIGINT) AS cents FROM events),
       |rep AS (SELECT event_type, event_id, cents, r.rep,
       |  ${sqlWeight("event_id", "r.rep")} AS w
       |  FROM base, (SELECT unnest(range($b)) AS rep) r),
       |m AS (SELECT event_type, rep, sum(w) AS sw, sum(w * cents) AS swx
       |  FROM rep GROUP BY 1, 2),
       |mm AS (SELECT event_type,
       |  CASE WHEN sw = 0 THEN 0 ELSE (swx * 1000 // sw) END AS mean_milli
       |  FROM m),
       |rk AS (SELECT event_type, mean_milli,
       |  row_number() OVER (PARTITION BY event_type ORDER BY mean_milli)
       |    AS rnk FROM mm),
       |lo AS (SELECT event_type, mean_milli AS lo95_milli FROM rk
       |  WHERE rnk = ${lowRank(b)}),
       |hi AS (SELECT event_type, mean_milli AS hi95_milli FROM rk
       |  WHERE rnk = ${highRank(b)}),
       |f AS (SELECT event_type, count(*)::BIGINT AS n,
       |  (sum(cents) * 1000 // count(*))::BIGINT AS mean_milli
       |  FROM base GROUP BY 1)
       |SELECT f.event_type, f.n, f.mean_milli,
       |  lo.lo95_milli::BIGINT AS lo95_milli, hi.hi95_milli::BIGINT AS hi95_milli
       |FROM f JOIN lo USING (event_type) JOIN hi USING (event_type)
       |ORDER BY event_type""".stripMargin
}
