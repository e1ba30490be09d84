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

  /** Embedding dimensionality — a DEPLOYMENT constant (you know your
    * embedder's d), not data-derived: the literal-unrolled oracle mirrors
    * and plan-baked codebook/hyperplane constants need it at build time.
    * Env-overridable (`SPARK_GRAFT_EMB_DIM`) so the dimension-axis studies
    * run the same keys at d = 512 with the SAME mirrored SQL — Verify
    * dumps oracle_sql.json in the same process, so both engines always
    * agree on d. Fixture default 64. Read per call; constant within a JVM.
    */
  def Dim: Int =
    sys.env.get("SPARK_GRAFT_EMB_DIM").map(_.toInt).getOrElse(64)

  /** Default training-sample size for the sampled-training path — the
    * 100 TB default: Lloyd rounds scan `min(corpus, TrainSampleRows)` rows
    * instead of the corpus. k-means quality saturates at a few hundred
    * points per centroid; the full-corpus pass is [[assignAll]], which is
    * narrow and shuffle-free. Full-corpus TRAINING ([[train]]) stays
    * available but is opt-in.
    */
  val TrainSampleRows = 256

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

  /** Deterministic hash-ranked training sample: the `maxRows` vectors
    * ranked first by (phash(vec_id), vec_id) — the same pseudo-random
    * total order [[train]]'s seeds use, so the sample is reproducible on
    * any cluster topology and the seed set is always a prefix of it.
    * Spark executes the order-limit as a distributed top-k
    * (TakeOrderedAndProject), never a global sort.
    */
  def trainingSample(emb: DataFrame, maxRows: Int = TrainSampleRows): DataFrame =
    emb
      .withColumn("__ph", PortableHash.phash(col("vec_id").cast("string")))
      .orderBy(col("__ph"), col("vec_id"))
      .limit(maxRows)
      .drop("__ph")

  /** [[train]] on the deterministic [[trainingSample]] — the default shape
    * for the engine's entry-point keys: Lloyd rounds cost O(sample), the
    * corpus is only touched by the narrow [[assignAll]] pass.
    */
  def trainSampled(emb: DataFrame, maxRows: Int = TrainSampleRows, k: Int = K,
                   iters: Int = Iters, dim: Int = Dim): Array[Array[Long]] =
    train(trainingSample(emb, maxRows), k, iters, dim)

  /** [[pqTrain]] on the deterministic [[trainingSample]] (one shared sample
    * for every subspace, mirroring the oracle's per-prefix replay).
    */
  def pqTrainSampled(emb: DataFrame, maxRows: Int = TrainSampleRows,
                     m: Int = PqM, k: Int = PqK, iters: Int = PqIters,
                     dim: Int = Dim): Seq[Array[Array[Long]]] =
    pqTrain(trainingSample(emb, maxRows), m, k, iters, dim)

  /** Train the codebook: `iters` Lloyd rounds from the phash seeds.
    * Returns `centroids(cid)(i)` — quantized integers. Scans `emb` once
    * per round: pass the full corpus only deliberately
    * ([[trainSampled]] is the at-scale default); the result is a plan
    * constant thereafter.
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

  /** Per-cell inertia audit of a trained codebook: member count, the EXACT
    * integer within-cell SSE Σ|q − c|² and its floored per-member mean —
    * the k-elbow / cell-balance diagnostic an IVF deployment reads before
    * trusting cell routing (one fat cell = one hot partition at query
    * time). |q − c|² expands to |q|² − 2 q·c + |c|² over the quantized
    * integers: every operand ≤ 10⁴ so products and sums stay exact in
    * double far below 2⁵³ ([[pqTopK]]'s ADC argument); the codebook rides
    * the plan as literals (|c|² lookup + centroid LUT — no join), so the
    * whole pass is ONE narrow projection + one k-bounded hash agg. SSE
    * accumulates in DECIMAL(38,0) (a cell's sum wraps long past ~3.5e8
    * max-distance members) and casts to BIGINT on output.
    */
  def inertia(emb: DataFrame, centroids: Array[Array[Long]]): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val qf = transform(quantize(col("embedding")), x => x.cast("float"))
    val cLut = typedlit(centroids.map(_.map(_.toFloat).toSeq).toSeq)
    val ccSq = typedlit(centroids.map(c => c.map(x => x * x).sum).toSeq)
    val a = emb
      .select(KMeansAssign.assign(col("embedding"), centroids, Scale.toDouble).as("cid"),
        qf.as("qf"))
      .filter(col("cid").isNotNull)
      .select(col("cid"),
        (Similarity.dot(col("qf"), col("qf")).cast("long")
          - lit(2L) * Similarity.dot(col("qf"),
              element_at(cLut, (col("cid") + 1).cast("int"))).cast("long")
          + element_at(ccSq, (col("cid") + 1).cast("int"))).as("d2"))
    a.groupBy("cid")
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("d2").cast(DecimalType(38, 0))).as("s"))
      .select(col("cid"), col("n_vecs"),
        expr("CAST(s AS BIGINT)").as("sse"),
        expr("CAST(s div n_vecs AS BIGINT)").as("mean_d2"))
  }

  /** Oracle for [[inertia]]: the training replay + direct Σ(qᵢ−cᵢ)² per
    * assigned cell over the quantized integer lists.
    */
  def sqlInertia(k: Int = K, iters: Int = Iters, dim: Int = Dim): String =
    s"""WITH ${sqlTrainCtes(k, iters, dim)}
       |SELECT a.cid, count(*)::BIGINT AS n_vecs,
       |  sum(list_sum([(p[1]-p[2])*(p[1]-p[2])
       |    for p in list_zip(q.ei, c.ei)])::BIGINT)::BIGINT AS sse,
       |  (sum(list_sum([(p[1]-p[2])*(p[1]-p[2])
       |    for p in list_zip(q.ei, c.ei)])::BIGINT)::HUGEINT
       |   // count(*))::BIGINT AS mean_d2
       |FROM a${iters + 1} a JOIN eq q USING (vec_id)
       |JOIN c$iters c ON c.cid = a.cid
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------ product quantization

  /** PQ defaults: 4 subspaces × 16 dims, 8 codes each, 2 Lloyd rounds —
    * a 64-dim vector compresses to 4 small codes (12 bits total vs 256
    * bytes of floats), the memory trade that makes billion-scale ANN fit
    * in RAM. Kept deliberately small so the DuckDB oracle can replay all
    * four sub-trainings.
    */
  val PqM = 4
  val PqK = 8
  val PqIters = 2

  /** Per-subspace codebooks: [[train]] run on each dim/m-wide slice of the
    * embedding. Reuses the whole exact-integer Lloyd pipeline — the
    * codebooks are bit-stable and oracle-replayable per subspace.
    */
  def pqTrain(emb: DataFrame, m: Int = PqM, k: Int = PqK, iters: Int = PqIters,
              dim: Int = Dim): Seq[Array[Array[Long]]] = {
    val sub = dim / m
    require(sub * m == dim, s"dim $dim must split evenly into $m subspaces")
    (0 until m).map { j =>
      train(emb.select(col("vec_id"),
        slice(col("embedding"), j * sub + 1, sub).as("embedding")), k, iters, sub)
    }
  }

  /** PQ encoding: m codegen'd argmin projections over the subvector slices
    * — narrow, no shuffle, the full-corpus pass of a PQ index build.
    */
  def pqEncode(emb: DataFrame, books: Seq[Array[Array[Long]]],
               dim: Int = Dim): DataFrame = {
    val sub = dim / books.length
    emb.select(col("vec_id") +: books.zipWithIndex.map { case (cb, j) =>
      KMeansAssign.assign(slice(col("embedding"), j * sub + 1, sub), cb, Scale.toDouble)
        .as(s"code_$j")
    }: _*)
  }

  /** Decoded (reconstructed) vector as a literal-lookup column: each code
    * indexes its subspace codebook (plan literals), concatenated back to a
    * dim-wide integer vector stored as floats (codebook entries are ≤10^4
    * in magnitude — exact in float).
    */
  private def decodedCol(books: Seq[Array[Array[Long]]], sub: Int): Column =
    concat(books.zipWithIndex.map { case (cb, j) =>
      val lut = typedlit(cb.map(_.map(_.toFloat).toSeq).toSeq)
      element_at(lut,
        (KMeansAssign.assign(slice(col("embedding"), j * sub + 1, sub), cb, Scale.toDouble)
          + 1).cast("int"))
    }: _*)

  /** IVF-PQ top-k: queries probe their coarse k-means cell (shuffle
    * equi-join on cid — never a cross product), candidates rank by the
    * EXACT-INTEGER asymmetric distance Σ(qᵢ − decodedᵢ)², computed as
    * |q|² − 2·q·d + |d|² over three codegen'd [[graft.expr.FloatVectorDot]]
    * calls (every operand is an integer ≤10⁴ stored in float: products and
    * sums stay exact in double far below 2⁵³, so the BIGINT cast is exact
    * and the DuckDB mirror — direct integer list arithmetic — agrees
    * bit-for-bit). The corpus side carries only codes + decoded lookups
    * (narrow projections); at scale this is the classic IVF-PQ read path:
    * coarse cell routing + m table lookups per candidate instead of a
    * full-vector scan.
    */
  def pqTopK(emb: DataFrame, coarse: Array[Array[Long]],
             books: Seq[Array[Array[Long]]], isQuery: Column, topK: Int,
             dim: Int = Dim): DataFrame = {
    val sub = dim / books.length
    val qi = quantize(col("embedding"))
    val qf = transform(qi, x => x.cast("float"))
    val dec = decodedCol(books, sub)
    val corpus = emb.select(col("vec_id").as("n_id"),
        KMeansAssign.assign(col("embedding"), coarse, Scale.toDouble).as("cid"),
        dec.as("dec"))
      .withColumn("ndd", Similarity.dot(col("dec"), col("dec")))
    val queries = emb.filter(isQuery).select(col("vec_id").as("q_id"),
        KMeansAssign.assign(col("embedding"), coarse, Scale.toDouble).as("cid"),
        qf.as("qf"))
      .withColumn("qq", Similarity.dot(col("qf"), col("qf")))
    val pairs = queries.join(corpus, Seq("cid"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (col("qq") - lit(2.0) * Similarity.dot(col("qf"), col("dec")) + col("ndd"))
          .cast("long").as("adc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("adc"), col("n_id"))
    pairs.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= topK)
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

  /** The full training replay as a WITH-clause body: defines CTEs
    * `${p}eq` (vec_id, embedding, ei — the whole table), `${p}es` (the
    * deterministic hash-ranked training sample, [[trainingSample]]'s twin),
    * `${p}c0..${p}c$iters` (codebooks — Lloyd rounds scan ONLY the sample),
    * `${p}a$iters+1` (final assignment of EVERY vector with the trained
    * codebook). `prefix` namespaces the CTEs so several trainings can
    * coexist in one oracle (the PQ sub-quantizers); `vecExpr` selects the
    * trained vector — a subvector slice for PQ subspaces. `sampleRows`
    * mirrors [[trainSampled]]'s default; pass `Int.MaxValue` to replay a
    * full-corpus [[train]].
    */
  def sqlTrainCtes(k: Int = K, iters: Int = Iters, dim: Int = Dim,
                   prefix: String = "", vecExpr: String = "embedding",
                   sampleRows: Int = TrainSampleRows): String = {
    require(k <= TieBase,
      s"argmin key encodes cid in base $TieBase: k=$k would collide across centroids")
    val p = prefix
    val ph = PortableHash.sqlPhash("vec_id::VARCHAR")
    val b = new StringBuilder
    b ++= s"""${p}eq AS (
             |  SELECT vec_id, embedding, ${sqlQuantize(vecExpr)} AS ei FROM embeddings
             |),
             |${p}es AS (
             |  SELECT vec_id, embedding, ei FROM (
             |    SELECT *, row_number() OVER (ORDER BY $ph, vec_id) AS srn FROM ${p}eq
             |  ) WHERE srn <= $sampleRows
             |),
             |${p}c0 AS (
             |  SELECT cid, ei FROM (
             |    SELECT row_number() OVER (ORDER BY $ph, vec_id) - 1 AS cid, ei FROM ${p}es
             |  ) WHERE cid < $k
             |)""".stripMargin
    for (t <- 1 to iters) {
      b ++= s",\n${p}a$t AS (\n${sqlAssign(s"${p}es", s"${p}c${t - 1}")}\n)"
      b ++= s",\n${p}c$t AS (\n${sqlUpdate(s"${p}a$t", s"${p}es", s"${p}c${t - 1}", dim)}\n)"
    }
    b ++= s",\n${p}a${iters + 1} AS (\n${sqlAssign(s"${p}eq", s"${p}c$iters")}\n)"
    b.toString
  }

  /** Oracle for the trained codebook itself (cid, idx, ci). */
  def sqlCentroids(k: Int = K, iters: Int = Iters, dim: Int = Dim): String =
    s"""WITH ${sqlTrainCtes(k, iters, dim)}
       |SELECT cid, r.range::INTEGER AS idx, ei[r.range + 1]::BIGINT AS ci
       |FROM c$iters CROSS JOIN range($dim) r
       |ORDER BY cid, idx""".stripMargin

  /** WITH-body continuing [[sqlTrainCtes]]: `n` (every vector with trained
    * cell + norm), `pm/pr` (per-query centroid ranking, top `nprobe`
    * probed), `pairs` (candidates with exact-cosine scores). Shared by the
    * probes oracle and the IVF recall audit.
    */
  def sqlIvfProbePairs(queryPred: String, nprobe: Int,
                       iters: Int = Iters): String =
    s"""n AS (
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
       |)""".stripMargin

  /** Oracle for [[ivfTopKProbes]]: centroids ranked per query by the same
    * exact-integer (distance, cid) order, top `nprobe` probed, cosine
    * rerank.
    */
  def sqlIvfTopKProbes(queryPred: String, topK: Int, nprobe: Int, k: Int = K,
                       iters: Int = Iters, dim: Int = Dim): String =
    s"""WITH ${sqlTrainCtes(k, iters, dim)},
       |${sqlIvfProbePairs(queryPred, nprobe, iters)}
       |SELECT q_id, n_id, cos_r, rnk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_r DESC, n_id) AS rnk
       |  FROM pairs
       |) WHERE rnk <= $topK
       |ORDER BY q_id, rnk, n_id""".stripMargin

  /** The m prefixed sub-quantizer trainings (`s0_…`, `s1_…`, …), each over
    * its subvector slice — the WITH-body shared by the PQ oracles.
    */
  private def sqlPqTrainings(m: Int, k: Int, iters: Int, dim: Int): String = {
    val sub = dim / m
    (0 until m).map { j =>
      sqlTrainCtes(k, iters, sub, prefix = s"s${j}_",
        vecExpr = s"embedding[${j * sub + 1}:${(j + 1) * sub}]")
    }.mkString(",\n")
  }

  /** Oracle for [[pqEncode]]-shaped output (vec_id, code_0..code_{m-1}). */
  def sqlPqCodes(m: Int = PqM, k: Int = PqK, iters: Int = PqIters,
                 dim: Int = Dim): String = {
    val joins = (0 until m)
      .map(j => s"JOIN s${j}_a${iters + 1} s$j USING (vec_id)").mkString("\n")
    val cols = (0 until m).map(j => s"s$j.cid AS code_$j").mkString(", ")
    s"""WITH ${sqlPqTrainings(m, k, iters, dim)}
       |SELECT e.vec_id, $cols
       |FROM embeddings e
       |$joins
       |ORDER BY e.vec_id""".stripMargin
  }

  /** WITH-body continuing the coarse + sub-quantizer trainings: `dec`
    * (decoded vectors via codebook joins), `n` (quantized vectors with
    * trained coarse cell), `pairs` (in-cell candidates with exact-integer
    * ADC distance). Shared by the PQ retrieval oracle and its recall audit.
    */
  def sqlPqPairs(queryPred: String, m: Int = PqM, pqIters: Int = PqIters,
                 iters: Int = Iters): String = {
    val decJoins = (0 until m)
      .map(j => s"JOIN s${j}_a${pqIters + 1} a$j USING (vec_id) " +
        s"JOIN s${j}_c$pqIters b$j ON b$j.cid = a$j.cid").mkString("\n  ")
    val decExpr = (0 until m).map(j => s"b$j.ei")
      .reduce((a, b) => s"list_concat($a, $b)")
    s"""dec AS (
       |  SELECT e.vec_id, $decExpr AS dei
       |  FROM embeddings e
       |  $decJoins
       |),
       |n AS (SELECT eq.vec_id, a.cid, eq.ei FROM eq JOIN a${iters + 1} a USING (vec_id)),
       |pairs AS (
       |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
       |    list_sum([(p[1]-p[2])*(p[1]-p[2]) for p in list_zip(q.ei, d.dei)])::BIGINT AS adc
       |  FROM n q JOIN n ON q.cid = n.cid AND q.vec_id <> n.vec_id
       |  JOIN dec d ON d.vec_id = n.vec_id
       |  WHERE $queryPred
       |)""".stripMargin
  }

  /** The coarse training + the m sub-quantizer trainings as one WITH-body
    * (what every PQ oracle starts from).
    */
  def sqlPqAllTrainings(m: Int = PqM, pqK: Int = PqK, pqIters: Int = PqIters,
                        k: Int = K, iters: Int = Iters, dim: Int = Dim): String =
    s"${sqlTrainCtes(k, iters, dim)},\n${sqlPqTrainings(m, pqK, pqIters, dim)}"

  /** Oracle for [[pqTopK]]: coarse training + m sub-trainings, decoded
    * vectors via codebook joins, exact-integer ADC distance, in-cell rank.
    */
  def sqlPqTopK(queryPred: String, topK: Int, m: Int = PqM, pqK: Int = PqK,
                pqIters: Int = PqIters, k: Int = K, iters: Int = Iters,
                dim: Int = Dim): String =
    s"""WITH ${sqlPqAllTrainings(m, pqK, pqIters, k, iters, dim)},
       |${sqlPqPairs(queryPred, m, pqIters, iters)}
       |SELECT q_id, n_id, adc, rnk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS rnk
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
