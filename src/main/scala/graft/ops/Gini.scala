package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact Gini coefficient of a non-negative integer measure over entities
  * (degree inequality of a graph, engagement inequality of a user base) —
  * the one-number skew gauge a pipeline owner reads BEFORE deciding
  * whether hub/heavy-hitter handling is worth paying for; the numeric
  * complement of `graph_degree_dist`'s histogram and `events_pareto`'s
  * cumulative-share rows.
  *
  * Exactness contract: with entities ranked 1..n ascending by value, the
  * closed form G = (2·Σ i·vᵢ − (n+1)·Σv) / (n·Σv) has an exact integer
  * numerator and denominator — Σ i·vᵢ is tie-permutation-invariant (equal
  * values swap equal terms), both sums ride DECIMAL(38,0), and the ppm
  * ships through ONE integer DIV. Degenerate Σv = 0 pins 0.
  *
  * Scale shape: the rank is [[GlobalRank.withGlobalRowNumberAndCount]]
  * at `Auto` buckets — corpus-scaled, never a single-partition window —
  * then one scalar aggregate. Headroom: Σ i·v ≤ n²·v̄ holds in
  * DECIMAL(38) to ~10¹⁵ entities of 10⁶ mean mass.
  */
object Gini {

  /** One row (n_entities, total, gini_ppm) from `counts(idCol, vCol)` —
    * vCol a non-negative integral column, idCol the deterministic
    * tie-break.
    */
  def ppm(counts: DataFrame, idCol: String, vCol: String): DataFrame = {
    val (ranked, n) = GlobalRank.withGlobalRowNumberAndCount(
      counts, vCol, Seq(idCol), GlobalRank.Auto, out = "__i")
    ranked
      .agg(sum(col(vCol).cast("decimal(38,0)")).as("sv"),
        sum(col("__i").cast("decimal(38,0)") * col(vCol)).as("siv"))
      .select(lit(n).as("n_entities"),
        coalesce(col("sv").cast("long"), lit(0L)).as("total"),
        when(coalesce(col("sv"), lit(0L).cast("decimal(38,0)")) === 0, 0L)
          .otherwise(expr(
            s"CAST(((2 * siv - ${n + 1} * sv) * 1000000) DIV ($n * sv) AS BIGINT)"))
          .as("gini_ppm"))
  }

  /** DuckDB mirror of [[ppm]] over a CTE `cnt(id, v)` in scope. */
  def sqlPpm: String =
    """rk AS (SELECT v, row_number() OVER (ORDER BY v, id) AS i FROM cnt),
      |ag AS (SELECT count(*)::HUGEINT AS n, sum(v)::HUGEINT AS sv,
      |         sum(i::HUGEINT * v) AS siv FROM rk)
      |SELECT n::BIGINT AS n_entities, coalesce(sv, 0)::BIGINT AS total,
      |  (CASE WHEN coalesce(sv, 0) = 0 THEN 0
      |        ELSE ((2 * siv - (n + 1) * sv) * 1000000) // (n * sv)
      |   END)::BIGINT AS gini_ppm
      |FROM ag""".stripMargin
}
