package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rich-club coefficient of an undirected graph (Zhou & Mondragón 2004):
  * for each degree threshold k, the density of the subgraph induced by
  * nodes of degree > k —
  *   φ(k) = 2·E_k · 10⁶ DIV (N_k·(N_k−1))   (exact integer ppm)
  * — do the hubs form a densely wired club? The structural complement of
  * [[Assortativity]]: r says whether hubs PREFER hubs edge-wise, φ(k)
  * says how completely the hub set is wired. Fewer than 2 qualifying
  * nodes leaves φ undefined → NULL in both engines.
  *
  * Scale shape: one degree aggregate, two degree-lookup equi-joins, then
  * a BROADCAST threshold grid (|ks| rows — the CoverageKs device) that
  * multiplies the edge stream by a constant ≤ |ks|; everything else is
  * k-grid-bounded. No quadratic cell: E_k is counted from the existing
  * edge list, never from pairs of club members.
  */
object RichClub {

  /** Default degree-threshold grid (doubling — the log-spaced sweep). */
  val Ks: Seq[Long] = Seq(1L, 2L, 4L, 8L, 16L, 32L)

  /** `edges` must be canonical distinct undirected pairs (a, b). */
  def richClub(edges: DataFrame, ks: Seq[Long] = Ks): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.localCheckpoint() // degree count + the edge-degree lookup
    val deg = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .localCheckpoint() // node-threshold counts + both edge lookups
    val kf = broadcast(ks.toDF("k"))
    val nk = deg.join(kf, col("deg") > col("k"))
      .groupBy("k").agg(count(lit(1)).as("n_k"))
    val ek = e
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
      .join(kf, col("da") > col("k") && col("db") > col("k"))
      .groupBy("k").agg(count(lit(1)).as("e_k"))
    kf.join(nk, Seq("k"), "left").join(ek, Seq("k"), "left")
      .select(col("k"),
        coalesce(col("n_k"), lit(0L)).as("n_nodes"),
        coalesce(col("e_k"), lit(0L)).as("n_edges"),
        when(coalesce(col("n_k"), lit(0L)) < 2L, lit(null))
          .otherwise(expr("(2 * coalesce(e_k, 0L) * 1000000) DIV (n_k * (n_k - 1))"))
          .cast("long").as("phi_ppm"))
      .orderBy("k")
  }

  /** DuckDB mirror of [[richClub]]; expects a CTE `ce(a, b)` with the
    * canonical distinct edges in scope.
    */
  def sqlRichClub(ks: Seq[Long] = Ks): String = {
    val grid = ks.map(k => s"($k)").mkString(", ")
    s"""dg AS (SELECT node, count(*)::BIGINT AS deg FROM (
       |  SELECT a AS node FROM ce UNION ALL SELECT b AS node FROM ce)
       |  GROUP BY 1),
       |kf AS (SELECT k FROM (VALUES $grid) t(k)),
       |nk AS (SELECT k, count(*)::BIGINT AS n_k FROM kf JOIN dg ON dg.deg > kf.k
       |       GROUP BY 1),
       |ed AS (SELECT d1.deg AS da, d2.deg AS db
       |  FROM ce JOIN dg d1 ON ce.a = d1.node JOIN dg d2 ON ce.b = d2.node),
       |ek AS (SELECT k, count(*)::BIGINT AS e_k
       |  FROM kf JOIN ed ON ed.da > kf.k AND ed.db > kf.k GROUP BY 1)
       |SELECT kf.k, coalesce(n_k, 0)::BIGINT AS n_nodes,
       |  coalesce(e_k, 0)::BIGINT AS n_edges,
       |  CASE WHEN coalesce(n_k, 0) < 2 THEN NULL
       |       ELSE (2 * coalesce(e_k, 0) * 1000000) // (n_k * (n_k - 1))
       |       END::BIGINT AS phi_ppm
       |FROM kf LEFT JOIN nk USING (k) LEFT JOIN ek USING (k)
       |ORDER BY k""".stripMargin
  }
}
