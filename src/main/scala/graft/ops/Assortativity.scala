package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree assortativity of an undirected graph (Newman 2002): the Pearson
  * correlation of endpoint degrees over the edge list — do hubs attach to
  * hubs (r > 0, social-network shape) or to leaves (r < 0, the
  * hub-and-spoke shape co-purchase graphs usually show)? The one-number
  * structure screen read next to `graph_degree_dist` before paying for
  * community detection.
  *
  * Exactness contract (the stats_corr device): each edge contributes its
  * degree pair in BOTH orientations, making the x- and y-marginals
  * identical — so the correlation needs NO square root:
  *   r = (M·Σxy − (Σx)²) / (M·Σx² − (Σx)²)
  * with all five moments exact DECIMAL(38,0) sums over integer degrees
  * and ONE correctly-rounded double division at the end — bit-equal
  * across engines at round(6). Degenerate regular graphs (every degree
  * equal → denominator 0) pin r = 0.
  *
  * Scale shape: two hash aggregates (degrees, moments) + two
  * degree-lookup equi-joins of the edge list — all shuffles on node/edge
  * keys, nothing quadratic, no window. Moment headroom: M·d_max² ≤ 10³⁸
  * holds far past any real co-purchase graph.
  */
object Assortativity {

  /** `edges` must be canonical distinct undirected pairs (a, b). */
  def degreeCorr(edges: DataFrame): DataFrame = {
    val e = edges.localCheckpoint() // degree count + both lookup joins
    val deg = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .localCheckpoint() // both sides of the endpoint lookups
    val pairs = e
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
      .select(col("da").cast("decimal(38,0)").as("x"),
        col("db").cast("decimal(38,0)").as("y"))
    val sym = pairs.unionAll(pairs.select(col("y").as("x"), col("x").as("y")))
    val num = (col("m") * col("sxy") - col("sx") * col("sx")).cast("double")
    val den = (col("m") * col("sxx") - col("sx") * col("sx")).cast("double")
    sym.agg(count(lit(1)).cast("decimal(38,0)").as("m"),
        sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .select(expr("CAST(m DIV 2 AS BIGINT)").as("n_edges"),
        when(den === 0.0, 0.0).otherwise(round(num / den, 6)).as("r_r"))
  }

  /** DuckDB mirror of [[degreeCorr]]; expects a CTE `ce(a, b)` with the
    * canonical distinct edges in scope.
    */
  def sqlDegreeCorr: String =
    """dg AS (SELECT node, count(*)::HUGEINT AS deg FROM (
      |  SELECT a AS node FROM ce UNION ALL SELECT b AS node FROM ce)
      |  GROUP BY 1),
      |pr AS (SELECT d1.deg AS x, d2.deg AS y
      |  FROM ce JOIN dg d1 ON ce.a = d1.node JOIN dg d2 ON ce.b = d2.node),
      |sym AS (SELECT x, y FROM pr UNION ALL SELECT y, x FROM pr),
      |ag AS (SELECT count(*)::HUGEINT AS m, sum(x) AS sx,
      |         sum(x * x) AS sxx, sum(x * y) AS sxy FROM sym)
      |SELECT (m // 2)::BIGINT AS n_edges,
      |  CASE WHEN (m * sxx - sx * sx) = 0 THEN 0.0
      |       ELSE round((m * sxy - sx * sx)::DOUBLE
      |              / (m * sxx - sx * sx)::DOUBLE, 6) END AS r_r
      |FROM ag""".stripMargin
}
