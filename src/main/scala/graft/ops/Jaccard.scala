package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighborhood-Jaccard similarity over a bipartite relation — "customers
  * who buy the same parts" — the classic co-occurrence recommender /
  * link-prediction score, computed by wedge enumeration per witness.
  *
  * Hub guard: wedges are enumerated per WITNESS w (each contributes
  * `deg(w)·(deg(w)−1)/2` candidate pairs), so an unfiltered hub witness is
  * the quadratic cell. Witnesses with `deg > maxWitnessDeg` are excluded
  * and — for a true Jaccard — the same filter defines the neighborhoods:
  * `N'(u) = { w ∈ N(u) : deg(w) ≤ maxWitnessDeg }`, score
  * `|N'(u)∩N'(v)| / |N'(u)∪N'(v)|`. The idf-style posture the engine
  * already takes in Sparse (df cap) and Dedup (MaxBandBucket): a witness
  * shared by everyone carries no similarity signal, and its removal bounds
  * every join cell by a constant — wedge volume stays edge-proportional at
  * any scale (the TPC-H per-part customer count is ~30 regardless of SF).
  *
  * Output: top-k pairs by (jac_r desc, a, b) with ≥ `minCommon` shared
  * witnesses; `jac_r` is one correctly-rounded double division of exact
  * integer counts. Top-k rides TakeOrderedAndProject on the total order —
  * k-bounded, no global window, no driver loop.
  */
object Jaccard {

  val MaxWitnessDeg = 40
  val MinCommon = 2
  val TopK = 50

  /** `adj`: bipartite adjacency (u, w) — distinct pairs, u the entity
    * being compared, w the shared-feature witness.
    */
  def similarPairs(adj: DataFrame,
                   maxWitnessDeg: Int = MaxWitnessDeg,
                   minCommon: Int = MinCommon,
                   topK: Int = TopK): DataFrame = {
    // adj feeds the degree count AND the witness filter; witness feeds the
    // self-join (both sides) AND the neighborhood sizes — without the
    // checkpoints Spark re-derives the upstream join once per consumer
    // (measured: 29 exchanges / 16 scans in the executed plan vs 7 / 2).
    val adjCk = adj.localCheckpoint()
    val deg = adjCk.groupBy(col("w")).agg(count(lit(1)).as("deg_w"))
    val witness = adjCk.join(deg, Seq("w")).filter(col("deg_w") <= maxWitnessDeg)
      .select("u", "w").localCheckpoint()
    val nprime = witness.groupBy("u").agg(count(lit(1)).as("degp"))
    witness.as("l")
      .join(witness.as("r"), col("l.w") === col("r.w") && col("l.u") < col("r.u"))
      .groupBy(col("l.u").as("a"), col("r.u").as("b"))
      .agg(count(lit(1)).as("cn"))
      .filter(col("cn") >= minCommon)
      .join(nprime.select(col("u").as("a"), col("degp").as("deg_a")), Seq("a"))
      .join(nprime.select(col("u").as("b"), col("degp").as("deg_b")), Seq("b"))
      .select(col("a"), col("b"), col("cn"), col("deg_a"), col("deg_b"),
        round(col("cn").cast("double") /
          (col("deg_a") + col("deg_b") - col("cn")).cast("double"), 6).as("jac_r"))
      .orderBy(col("jac_r").desc, col("a"), col("b"))
      .limit(topK)
  }

  /** DuckDB mirror over the customer→part purchase relation. */
  def sqlSimilarPairs(maxWitnessDeg: Int = MaxWitnessDeg,
                      minCommon: Int = MinCommon,
                      topK: Int = TopK): String =
    s"""WITH cp AS (SELECT DISTINCT o.o_custkey AS u, li.l_partkey AS w
       |  FROM orders o JOIN lineitem li ON o.o_orderkey = li.l_orderkey),
       |dg AS (SELECT w, count(*)::BIGINT AS deg_w FROM cp GROUP BY 1),
       |wit AS (SELECT u, cp.w FROM cp JOIN dg ON cp.w = dg.w
       |        WHERE deg_w <= $maxWitnessDeg),
       |np AS (SELECT u, count(*)::BIGINT AS degp FROM wit GROUP BY 1),
       |cn AS (SELECT l.u AS a, r.u AS b, count(*)::BIGINT AS cn
       |  FROM wit l JOIN wit r ON l.w = r.w AND l.u < r.u
       |  GROUP BY 1, 2 HAVING count(*) >= $minCommon)
       |SELECT p.a, p.b, p.cn, da.degp AS deg_a, db.degp AS deg_b,
       |  round(p.cn::DOUBLE / (da.degp + db.degp - p.cn)::DOUBLE, 6) AS jac_r
       |FROM cn p JOIN np da ON p.a = da.u JOIN np db ON p.b = db.u
       |ORDER BY jac_r DESC, p.a, p.b LIMIT $topK""".stripMargin
}
