package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expr.{KMeansAssign, PortableHash}

/** Trained IVF quantizer: distributed Lloyd's k-means over the embedding
  * corpus, in EXACT INTEGER arithmetic so that the result is (a) bit-stable
  * across engines — the DuckDB oracle replays the identical iterations in
  * SQL — and (b) independent of partitioning and aggregation order, which
  * float k-means is NOT (double sums reorder under shuffle; two runs of a
  * float Lloyd step on different cluster topologies legitimately diverge).
  *
  * Vectors quantize to `floor(x * 10^4)` (unit-normalized embeddings →
  * |q| ≤ 10^4, every dot/norm/sum below 2^36 — exact in long AND double).
  * Each Lloyd round is:
  *
  *   1. assign: nearest centroid by squared-L2 via `argmin_c (|c|² - 2 v·c)`
  *      — a NARROW codegen'd projection ([[graft.expr.KMeansAssign]], the
  *      centroid codebook rides the plan as literals; no join, no shuffle);
  *   2. update: `explode → groupBy(cid, idx) → sum/count` — ONE shuffle of
  *      k×dim-bounded partial aggregates; the driver sees only the k×dim
  *      centroid table (loop-control constants, like Dedup.clusters' count);
  *      empty clusters keep their previous position; the new coordinate is
  *      `floorDiv(sum, count)` (exact integer mean).
  *
  * At 100 TB: train on a deterministic sample (pass the output of
  * [[Scrub.stratifiedKeep]] — topology-independent, so the trained codebook
  * is reproducible), then [[assignAll]] the full corpus in one narrow pass.
  * Iteration count is FIXED (not convergence-tested) so the oracle can
  * unroll the same number of rounds; k-means at fixed seed + fixed rounds is
  * fully deterministic.
  *
  * The reference has no vector surface; this extends the engine for the
  * training-data-pipeline brief alongside [[Similarity]]'s LSH paths (LSH =
  * data-independent cells, k-means = data-adapted cells; production IVF uses
  * exactly this split: coarse k-means codebook + in-cell exact rerank).
  */
object Quantizer {

  val Scale = 10000L
  val K = 8
  val Iters = 3
  val Dim = 64

  /** Integer quantization of a float vector (train-path only — assignment
    * fuses the same `floor` into [[KMeansAssign]]'s codegen loop; this HOF
    * runs interpreted, acceptable once per training row, never in the
    * full-corpus path).
    */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(Scale.toDouble)).cast("long"))

  def sqlQuantize(vecE: String): String =
    s"[floor(x::DOUBLE * ${Scale.toDouble})::BIGINT for x in $vecE]"

  /** Deterministic seeds: the k vectors ranked first by (phash(vec_id),
    * vec_id) — pseudo-random spread, no RNG state, same k rows everywhere.
    */
  private def seeds(embi: DataFrame, k: Int): Array[Array[Long]] =
    embi
      .withColumn("ph", PortableHash.phash(col("vec_id").cast("string")))
      .orderBy("ph", "vec_id")
      .limit(k)
      .select("ph", "vec_id", "ei")
      .collect()
      .sortBy(r => (r.getLong(0), r.getLong(1))) // re-assert order driver-side
      .map(_.getSeq[Long](2).toArray)

  /** Train the codebook: `iters` Lloyd rounds from the phash seeds.
    * Returns `centroids(cid)(i)` — quantized integers. Train on a sample at
    * scale (see object doc); the result is a plan constant thereafter.
    */
  def train(emb: DataFrame, k: Int = K, iters: Int = Iters,
            dim: Int = Dim): Array[Array[Long]] = {
    val embi = emb.select(col("vec_id"), quantize(col("embedding")).as("ei"))
    var centroids = seeds(embi, k)
    for (_ <- 0 until iters) {
      val assigned = emb.select(
        KMeansAssign.assign(col("embedding"), centroids, Scale.toDouble).as("cid"),
        quantize(col("embedding")).as("ei"))
      val sums = assigned
        .filter(col("cid").isNotNull) // malformed vectors train nothing
        .select(col("cid"), posexplode(col("ei")).as(Seq("idx", "e")))
        .groupBy("cid", "idx")
        .agg(sum("e").as("s"), count(lit(1)).as("n"))
        .collect()
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = Math.floorDiv(r.getLong(2), r.getLong(3))
      }
      centroids = next
    }
    centroids
  }

  /** The trained codebook as a DataFrame (cid, idx, ci) — k×dim rows. */
  def centroidsDF(spark: SparkSession, centroids: Array[Array[Long]]): DataFrame = {
    import spark.implicits._
    centroids.zipWithIndex.flatMap { case (c, cid) =>
      c.zipWithIndex.map { case (ci, idx) => (cid, idx, ci) }
    }.toSeq.toDF("cid", "idx", "ci")
  }

  /** Full-corpus assignment — one narrow codegen'd projection, no shuffle. */
  def assignAll(emb: DataFrame, centroids: Array[Array[Long]]): DataFrame =
    emb.withColumn("cid", KMeansAssign.assign(col("embedding"), centroids, Scale.toDouble))

  /** IVF top-k with the TRAINED quantizer: queries probe their own k-means
    * cell, candidates rerank by exact cosine (same shape as
    * [[Similarity.topK]] `sameCellOnly`, with data-adapted cells).
    */
  def ivfTopK(emb: DataFrame, centroids: Array[Array[Long]],
              isQuery: Column, k: Int): DataFrame = {
    val n = Similarity.withNorm(assignAll(emb, centroids))
    val q = n.filter(isQuery).select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb"), col("nrm").as("q_nrm"), col("cid").as("q_cid"))
    val pairs = q.join(n, col("q_cid") === col("cid") && col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(Similarity.dot(col("q_emb"), col("embedding")) /
          (col("q_nrm") * col("nrm")), 6).as("cos_r"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos_r").desc, col("n_id"))
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Multi-probe IVF top-k: each query probes its `nprobe` NEAREST cells
    * (same exact-integer distance as assignment, [[graft.expr.KMeansProbes]])
    * instead of one — recovering the recall a boundary-adjacent query loses
    * in [[ivfTopK]], at nprobe× candidate cost. A candidate's cell is
    * unique, so the probe join produces no duplicate pairs.
    */
  def ivfTopKProbes(emb: DataFrame, centroids: Array[Array[Long]],
                    isQuery: Column, k: Int, nprobe: Int): DataFrame = {
    val n = Similarity.withNorm(assignAll(emb, centroids))
    val q = n.filter(isQuery)
      .withColumn("probe", explode(
        graft.expr.KMeansProbes.probes(col("embedding"), centroids, Scale.toDouble, nprobe)))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("probe"))
    val pairs = q.join(n, col("probe") === col("cid") && col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(Similarity.dot(col("q_emb"), col("embedding")) /
          (col("q_nrm") * col("nrm")), 6).as("cos_r"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos_r").desc, col("n_id"))
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  // --------------------------------------------------------- oracle mirror

  /** Tie-break base for the SQL argmin key `(|c|² - 2 v·c) * TieBase + cid`
    * — lexicographic (distance, cid) as one BIGINT; must exceed k.
    */
  private val TieBase = 16
  require(K <= TieBase)

  /** SQL argmin-key assignment over a centroid CTE `c` (cid, ei) joined
    * against quantized vectors `q` (vec_id, ei) — mirrors [[KMeansAssign]].
    */
  private def sqlAssign(qCte: String, cCte: String): String =
    s"""SELECT vec_id, (((min(key) % $TieBase) + $TieBase) % $TieBase)::INTEGER AS cid FROM (
       |  SELECT q.vec_id,
       |         (list_sum([x*x for x in c.ei])::BIGINT
       |          - 2*list_sum([p[1]*p[2] for p in list_zip(q.ei, c.ei)])::BIGINT)
       |           * $TieBase + c.cid AS key
       |  FROM $qCte q CROSS JOIN $cCte c
       |) GROUP BY vec_id""".stripMargin

  /** One Lloyd update: per-(cid, idx) exact integer mean (floor division via
    * the pmod identity — DuckDB `%` is truncated, not floored), empty
    * clusters inherit the previous centroid.
    */
  private def sqlUpdate(aCte: String, qCte: String, prevC: String, dim: Int): String =
    s"""SELECT pc.cid, coalesce(g.l, pc.ei) AS ei FROM $prevC pc LEFT JOIN (
       |  SELECT cid, list(((s - (((s % n) + n) % n)) / n)::BIGINT ORDER BY idx) AS l FROM (
       |    SELECT a.cid, r.range::INTEGER AS idx,
       |           sum(q.ei[r.range + 1])::BIGINT AS s, count(*)::BIGINT AS n
       |    FROM $aCte a JOIN $qCte q USING (vec_id) CROSS JOIN range($dim) r
       |    GROUP BY 1, 2
       |  ) GROUP BY cid
       |) g USING (cid)""".stripMargin

  /** The full training replay as a WITH-clause body: defines CTEs `eq`
    * (vec_id, embedding, ei), `c0..c$iters` (codebooks), `a$iters+1` (final
    * assignment of every vector with the trained codebook).
    */
  def sqlTrainCtes(k: Int = K, iters: Int = Iters, dim: Int = Dim): String = {
    require(k <= TieBase,
      s"argmin key encodes cid in base $TieBase: k=$k would collide across centroids")
    val ph = PortableHash.sqlPhash("vec_id::VARCHAR")
    val b = new StringBuilder
    b ++= s"""eq AS (
             |  SELECT vec_id, embedding, ${sqlQuantize("embedding")} AS ei FROM embeddings
             |),
             |c0 AS (
             |  SELECT cid, ei FROM (
             |    SELECT row_number() OVER (ORDER BY $ph, vec_id) - 1 AS cid, ei FROM eq
             |  ) WHERE cid < $k
             |)""".stripMargin
    for (t <- 1 to iters) {
      b ++= s",\na$t AS (\n${sqlAssign("eq", s"c${t - 1}")}\n)"
      b ++= s",\nc$t AS (\n${sqlUpdate(s"a$t", "eq", s"c${t - 1}", dim)}\n)"
    }
    b ++= s",\na${iters + 1} AS (\n${sqlAssign("eq", s"c$iters")}\n)"
    b.toString
  }

  /** Oracle for the trained codebook itself (cid, idx, ci). */
  def sqlCentroids(k: Int = K, iters: Int = Iters, dim: Int = Dim): String =
    s"""WITH ${sqlTrainCtes(k, iters, dim)}
       |SELECT cid, r.range::INTEGER AS idx, ei[r.range + 1]::BIGINT AS ci
       |FROM c$iters CROSS JOIN range($dim) r
       |ORDER BY cid, idx""".stripMargin

  /** Oracle for [[ivfTopKProbes]]: centroids ranked per query by the same
    * exact-integer (distance, cid) order, top `nprobe` probed, cosine
    * rerank.
    */
  def sqlIvfTopKProbes(queryPred: String, topK: Int, nprobe: Int, k: Int = K,
                       iters: Int = Iters, dim: Int = Dim): String =
    s"""WITH ${sqlTrainCtes(k, iters, dim)},
       |n AS (
       |  SELECT eq.vec_id, eq.embedding, a.cid,
       |         sqrt(${Similarity.sqlDot("eq.embedding", "eq.embedding")}) AS nrm
       |  FROM eq JOIN a${iters + 1} a USING (vec_id)
       |),
       |pm AS (
       |  SELECT q.vec_id, c.cid,
       |         (list_sum([x*x for x in c.ei])::BIGINT
       |          - 2*list_sum([p[1]*p[2] for p in list_zip(q.ei, c.ei)])::BIGINT) AS m
       |  FROM eq q CROSS JOIN c$iters c WHERE $queryPred
       |),
       |pr AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY m, cid) AS r
       |    FROM pm
       |  ) WHERE r <= $nprobe
       |),
       |pairs AS (
       |  SELECT pr.vec_id AS q_id, n.vec_id AS n_id,
       |         round(${Similarity.sqlDot("qn.embedding", "n.embedding")} / (qn.nrm * n.nrm), 6) AS cos_r
       |  FROM pr JOIN n qn ON pr.vec_id = qn.vec_id
       |          JOIN n ON n.cid = pr.cid AND n.vec_id <> pr.vec_id
       |)
       |SELECT q_id, n_id, cos_r, rnk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_r DESC, n_id) AS rnk
       |  FROM pairs
       |) WHERE rnk <= $topK
       |ORDER BY q_id, rnk, n_id""".stripMargin

  /** Oracle for [[ivfTopK]]: final assignment + in-cell cosine rerank. */
  def sqlIvfTopK(queryPred: String, topK: Int, k: Int = K, iters: Int = Iters,
                 dim: Int = Dim): String =
    s"""WITH ${sqlTrainCtes(k, iters, dim)},
       |n AS (
       |  SELECT eq.vec_id, eq.embedding, a.cid,
       |         sqrt(${Similarity.sqlDot("eq.embedding", "eq.embedding")}) AS nrm
       |  FROM eq JOIN a${iters + 1} a USING (vec_id)
       |),
       |pairs AS (
       |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
       |         round(${Similarity.sqlDot("q.embedding", "n.embedding")} / (q.nrm * n.nrm), 6) AS cos_r
       |  FROM n q JOIN n ON q.cid = n.cid AND q.vec_id <> n.vec_id
       |  WHERE $queryPred
       |)
       |SELECT q_id, n_id, cos_r, rnk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_r DESC, n_id) AS rnk
       |  FROM pairs
       |) WHERE rnk <= $topK
       |ORDER BY q_id, rnk, n_id""".stripMargin
}
