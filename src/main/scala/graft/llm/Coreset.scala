package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.KMeansAssign

/** Greedy k-center coreset selection (Gonzalez 1985 farthest-point
  * traversal — the 2-approximation for metric k-center) over the embedding
  * column: pick the point farthest from the selected set, k times. The
  * selected set is the standard diversity coreset of the data-selection
  * literature (facility-location / k-center objectives in DeepCore;
  * "coverage" sampling in DataComp-style curation): k representatives
  * whose coverage radius bounds every point's distance to its nearest
  * representative — the complement of [[Similarity]]'s near-DUPLICATE
  * removal (SemDeDup keeps what is far apart; k-center FINDS what is far
  * apart).
  *
  * Determinism: distances are exact integer squared-L2 over
  * [[Quantizer.quantize]]d vectors (every |q|², q·c, |c|² ≤ 64·(2·10⁴)² ≈
  * 2.6e10 — exactly representable in double and BIGINT, the
  * [[Quantizer.inertia]] argument), the first center is the smallest
  * vec_id, and the farthest-point argmax breaks ties toward the smaller
  * vec_id — so the selection is a pure function of the data, replayed
  * round-for-round by the DuckDB oracle.
  *
  * Scale shape (100 TB): the driver holds k quantized centers (k·dim
  * longs — the [[Quantizer]] codebook-collect precedent) and runs k
  * rounds; each round is ONE narrow codegen projection
  * ([[KMeansAssign]] against the current centers as plan literals + the
  * centroid-LUT distance expansion — no join, no explode) and ONE 1-row
  * struct-max aggregate. Nothing per-pair, nothing quadratic, no
  * partition-less window; total cost k × (map pass + tree-reduce), the
  * same posture as [[Pca.pc1]]'s bounded driver iteration.
  */
object Coreset {

  /** Selection rounds for the entry-point keys (the oracle unrolls k
    * CTE rounds — keep it small; production callers pass their own k).
    */
  val K = 5

  /** quantized-float view + |q|² of the embedding, the [[Quantizer.inertia]]
    * distance kernel: d²(q, c) = |q|² − 2 q·c + |c|² with c a plan literal.
    */
  private def qf: Column =
    transform(Quantizer.quantize(col("embedding")), x => x.cast("float"))

  /** Well-formedness, matching [[KMeansAssign]]'s NULL contract exactly
    * (non-null, dim [[Quantizer.Dim]], no null element). The first-center
    * pick and the oracle's `eq` CTE both apply it so that a malformed
    * min-id row can neither NPE `fetch(first)` nor leave the oracle
    * counting rows Spark's `nearest()` drops (advice finding, round 8).
    */
  private def wellFormed: Column =
    col("embedding").isNotNull &&
      size(col("embedding")) === Quantizer.Dim &&
      forall(col("embedding"), x => x.isNotNull)

  /** (vec_id, cid, d2) of every vector against `centers` (selection order
    * = cid): nearest center by exact integer squared-L2, ties toward the
    * earlier-selected center ([[KMeansAssign]]'s strict-< argmin).
    */
  private def nearest(emb: DataFrame, centers: Array[Array[Long]]): DataFrame = {
    val cLut = typedlit(centers.map(_.map(_.toFloat).toSeq).toSeq)
    val ccSq = typedlit(centers.map(c => c.map(x => x * x).sum).toSeq)
    emb
      .select(col("vec_id"),
        KMeansAssign.assign(col("embedding"), centers, Quantizer.Scale.toDouble).as("cid"),
        qf.as("qf"))
      .filter(col("cid").isNotNull) // malformed vectors select nothing
      .select(col("vec_id"), col("cid"),
        (graft.llm.Similarity.dot(col("qf"), col("qf")).cast("long")
          - lit(2L) * graft.llm.Similarity.dot(col("qf"),
              element_at(cLut, (col("cid") + 1).cast("int"))).cast("long")
          + element_at(ccSq, (col("cid") + 1).cast("int"))).as("d2"))
  }

  /** The k selected centers with the coverage curve: round r's row is
    * (round, center_vec_id, coverage_d2) where coverage_d2 = max over the
    * corpus of the squared distance to the nearest of the first r centers
    * — the radius the k-center objective minimizes, and the elbow curve a
    * selection pipeline reads to size k. Center r+1 is the witness of
    * round r's coverage (the farthest point). First center = min vec_id.
    *
    * Driver state: k (round, id, coverage) triples + k quantized centers —
    * k-bounded, the [[Quantizer.train]] / [[Pca.pc1]] collect precedent.
    * On a corpus of duplicates coverage can reach 0; selection still emits
    * k deterministic rows (the witness of a 0-radius round is the smallest
    * uncovered... every point, so the min vec_id re-selects — harmless and
    * replayable; real corpora never hit it).
    */
  def kcenterRows(emb: DataFrame, k: Int = K): Seq[(Long, Long, Long)] = {
    val embq = emb.select(col("vec_id"), Quantizer.quantize(col("embedding")).as("ei"))
    def fetch(id: Long): Array[Long] =
      embq.filter(col("vec_id") === id).collect().head.getSeq[Long](1).toArray
    // fail loudly, not with an NPE, on an empty/all-malformed corpus
    // (review finding): min() over zero rows is a NULL aggregate. The min
    // ranges over WELL-FORMED rows only — the same frame nearest() scores.
    val firstRow = emb.filter(wellFormed).agg(min("vec_id")).collect().head
    require(!firstRow.isNullAt(0),
      "k-center selection needs at least one well-formed embedding row")
    val first = firstRow.getLong(0)
    var ids = Vector(first)
    var centers = Vector(fetch(first))
    val out = Vector.newBuilder[(Long, Long, Long)]
    for (r <- 1 to k) {
      val m = nearest(emb, centers.toArray)
        .agg(max(struct(col("d2"), (-col("vec_id")).as("nv"))).as("m"))
        .select(col("m.d2"), col("m.nv")).collect().head
      // all-malformed corpora leave nearest() empty -> a NULL struct-max
      require(!m.isNullAt(0),
        "k-center selection needs at least one WELL-FORMED vector " +
          s"(dim ${Quantizer.Dim}, no null elements)")
      val coverage = m.getLong(0)
      val witness = -m.getLong(1)
      out += ((r.toLong, ids(r - 1), coverage))
      if (r < k) {
        ids = ids :+ witness
        centers = centers :+ fetch(witness)
      }
    }
    out.result()
  }

  /** [[kcenterRows]] as the entry-point frame (round, center_vec_id,
    * coverage_d2), ordered by round.
    */
  def kcenter(spark: SparkSession, emb: DataFrame, k: Int = K): DataFrame = {
    import spark.implicits._
    kcenterRows(emb, k).toDF("round", "center_vec_id", "coverage_d2")
      .orderBy("round")
  }

  /** Full-corpus assignment against the k selected centers: (vec_id, cid
    * = selection round − 1, center_vec_id, d2) — the partition of the
    * corpus into k diversity cells (what gets sampled per-cell downstream)
    * plus each point's exact distance. One narrow codegen pass, the
    * [[Quantizer.assignAll]] posture.
    */
  def assign(emb: DataFrame, centerIds: Seq[Long],
             centers: Array[Array[Long]]): DataFrame =
    nearest(emb, centers)
      .select(col("vec_id"), col("cid").cast("long").as("cid"),
        element_at(typedlit(centerIds), (col("cid") + 1).cast("int")).as("center_vec_id"),
        col("d2"))

  /** Select-then-assign, re-deriving centers with [[kcenterRows]] (the
    * entry-point key shape: selection cost is k bounded passes).
    */
  def kcenterAssign(emb: DataFrame, k: Int = K): DataFrame = {
    val rows = kcenterRows(emb, k)
    val ids = rows.map(_._2)
    val embq = emb.select(col("vec_id"), Quantizer.quantize(col("embedding")).as("ei"))
    val byId = embq.filter(col("vec_id").isin(ids: _*)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    assign(emb, ids, ids.map(byId).toArray)
  }

  // ------------------------------------------------------------- oracles

  private def d2(a: String, b: String): String =
    s"list_sum([(p[1]-p[2])*(p[1]-p[2]) for p in list_zip($a, $b)])::BIGINT"

  /** Round CTEs shared by both oracles: `eq` (quantized vectors), `kR`
    * (the R-th center's row), `mR` (min-d2 to the first R centers).
    */
  private def sqlRoundCtes(k: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""eq AS (SELECT vec_id, ${Quantizer.sqlQuantize("embedding")} AS ei
              |       FROM embeddings
              |       WHERE embedding IS NOT NULL
              |         AND len(embedding) = ${Quantizer.Dim}
              |         AND list_aggregate(embedding, 'count') = ${Quantizer.Dim}),
              |k1 AS (SELECT vec_id, ei FROM eq
              |       WHERE vec_id = (SELECT min(vec_id) FROM eq)),
              |m1 AS (SELECT eq.vec_id, ${d2("eq.ei", "k1.ei")} AS d FROM eq, k1)""".stripMargin
    for (r <- 2 to k) {
      sb ++= s""",
                |w${r - 1} AS (SELECT vec_id FROM m${r - 1} ORDER BY d DESC, vec_id LIMIT 1),
                |k$r AS (SELECT eq.vec_id, eq.ei FROM eq, w${r - 1} WHERE eq.vec_id = w${r - 1}.vec_id),
                |m$r AS (SELECT m.vec_id, least(m.d, ${d2("eq.ei", s"k$r.ei")}) AS d
                |        FROM m${r - 1} m JOIN eq USING (vec_id), k$r)""".stripMargin
    }
    sb.result()
  }

  /** DuckDB mirror of [[kcenter]]: the k rounds unrolled CTE-for-CTE. */
  def sqlKcenter(k: Int = K): String = {
    val rows = (1 to k).map { r =>
      s"SELECT ${r}::BIGINT AS round, (SELECT vec_id FROM k$r) AS center_vec_id, " +
        s"(SELECT max(d) FROM m$r)::BIGINT AS coverage_d2"
    }.mkString("\n", "\nUNION ALL ", "")
    s"WITH ${sqlRoundCtes(k)}$rows\nORDER BY round"
  }

  /** DuckDB mirror of [[kcenterAssign]]: replay the selection, then per
    * vector the (d2, cid)-min center — the [[KMeansAssign]] tie rule.
    */
  def sqlAssign(k: Int = K): String = {
    val cents = (1 to k).map(r =>
      s"SELECT ${r - 1}::BIGINT AS cid, vec_id AS center_vec_id, ei FROM k$r")
      .mkString(" UNION ALL ")
    s"""WITH ${sqlRoundCtes(k)},
       |cents AS ($cents),
       |ds AS (SELECT eq.vec_id, c.cid, c.center_vec_id,
       |         ${d2("eq.ei", "c.ei")} AS d2 FROM eq, cents c),
       |best AS (SELECT vec_id, cid, center_vec_id, d2, row_number() OVER (
       |  PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM ds)
       |SELECT vec_id, cid, center_vec_id, d2 FROM best WHERE rn = 1
       |ORDER BY vec_id""".stripMargin
  }
}
