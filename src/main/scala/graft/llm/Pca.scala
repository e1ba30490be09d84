package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dominant principal direction of the embedding cloud by power iteration
  * on the (uncentered) mean Gram matrix — the dimensionality-reduction
  * primitive an ANN/visualization pipeline runs before index build, kept
  * fully EXACT so the DuckDB oracle replays it bit-for-bit.
  *
  * Determinism strategy: floats never meet an ordering-sensitive sum.
  * Embeddings are quantized to ints ([[Quantizer.quantize]], scale 1e4),
  * the Gram sums run in DECIMAL(38,0) (order-independent), and the
  * iteration itself is pure integer arithmetic — matvec in BIGINT,
  * normalization by max-|u| via sign-split FLOOR division (both engines
  * floor nonneg division identically; signed `div`/`//` disagree, trunc
  * vs floor, which is why the sign is factored out first).
  *
  * Magnitude audit (why BIGINT never overflows): |q| ≤ 1e4·max|x|, mean
  * gram |gm| ≤ 1e8·max|x|² (n divides out), |v| ≤ 1e6, so |u| ≤
  * dim·1e14·max|x|² ≈ 6.4e15 for unit-ish vectors at dim 64 — three
  * decimal orders under Long.Max, corpus-size-independent.
  *
  * Scale shape: ONE map-side-combinable aggregate over the corpus builds
  * the dim²-row Gram (upper triangle aggregated, mirrored below); the
  * power iteration is a chain of joins over dim-row/dim²-row metadata
  * frames (never touches the corpus); the projection pass is one narrow
  * scan with the final component rows broadcast-joined in. At 100 TB the
  * corpus is read exactly twice (Gram, projection).
  */
object Pca {

  /** Power-iteration rounds — enough for clear spectral gaps at the
    * fixture scale; a production caller would expose this as a knob.
    */
  val Iters = 6

  /** Component scale: v entries live in [-1e6, 1e6] ("ppm of max"). */
  val VScale = 1000000L

  /** Full (mirrored) mean-Gram frame: (i, j, gm) with
    * gm = floor(Σ q_i·q_j / n). The triangle rides [[graft.expr.GramAgg]]
    * (one in-buffer aggregation pass — the r11 dimension study measured
    * the old per-row cell explode at 34× wall for 8× dims on this key's
    * consumer), unfolded to (i, j) cells by a dim-bounded two-level
    * posexplode, lower triangle mirrored.
    */
  def meanGram(emb: DataFrame): DataFrame = {
    val dim = Quantizer.Dim
    val g = emb.select(Quantizer.quantize(col("embedding")).as("q"))
      .agg(graft.expr.GramAgg.gram(col("q"), dim).as("g"))
      .select(col("g.n").as("n"), col("g.tri").as("tri"))
    val upper = g
      .select(col("n"), explode(sequence(lit(0), lit(dim - 1))).as("i"), col("tri"))
      .select(col("n"), col("i"),
        expr(s"slice(tri, i * $dim - (i * (i - 1)) div 2 + 1, $dim - i)").as("seg"))
      .select(col("n"), col("i"), posexplode(col("seg")).as(Seq("joff", "sxy")))
      // n is the vector count (constant per cell); floor(sxy / n) in
      // sign-split form so both engines agree on negatives
      .select(col("i").cast("long").as("i"),
        (col("i") + col("joff")).cast("long").as("j"),
        (signum(col("sxy")).cast("long") *
          expr("CAST(abs(sxy) AS DECIMAL(38,0)) div CAST(n AS DECIMAL(38,0))")
            .cast("long")).as("gm"))
      // the mirror union consumes this twice; cut so the corpus-sized
      // aggregate runs once (dim²/2 rows stored — metadata)
      .localCheckpoint()
    upper.unionAll(
      upper.filter(col("i") < col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("gm")))
  }

  /** The dominant component after [[Iters]] rounds: (idx, v) with v in
    * [[VScale]] units.
    *
    * The iteration runs DRIVER-SIDE on the collected Gram: dim² rows is
    * bounded loop-control metadata, corpus-size-independent — the same
    * driver-crossing class as k-means codebooks and GlobalRank bucket
    * offsets, never row data. (A frame-per-round formulation was tried
    * first: `u` is consumed twice per round, so the uncut lineage doubled
    * per round — ~380 exchanges in the executed plan at Iters=6 — and
    * cutting each round cost 12 scheduler roundtrips per build. Six
    * rounds of 64-element exact long arithmetic do not need a cluster.)
    */
  def pc1(spark: SparkSession, emb: DataFrame): DataFrame = {
    val dim = Quantizer.Dim
    val g = Array.ofDim[Long](dim, dim)
    meanGram(emb).collect().foreach { r =>
      g(r.getAs[Long]("i").toInt)(r.getAs[Long]("j").toInt) = r.getAs[Long]("gm")
    }
    var v = Array.fill(dim)(VScale)
    for (_ <- 1 to Iters) {
      // exact mirror of the oracle CTE chain: BIGINT matvec, max-abs
      // scale-down, sign-split floor division (all values |u| ≤ ~6.4e15,
      // see the magnitude audit above — no overflow)
      val u = Array.tabulate(dim)(i =>
        (0 until dim).map(j => g(i)(j) * v(j)).sum)
      val md = u.map(math.abs).max / VScale + 1L
      v = u.map(x => (if (x < 0) -1L else 1L) * (math.abs(x) / md))
    }
    import spark.implicits._
    v.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toSeq
      .toDF("idx", "v")
  }

  /** Per-vector projection onto [[pc1]]: (vec_id, proj) in exact
    * q·v integer units — the 1-D coordinate a curriculum or
    * visualization slice orders by.
    */
  def projections(spark: SparkSession, emb: DataFrame): DataFrame = {
    val comp = pc1(spark, emb)
    emb.select(col("vec_id"), posexplode(Quantizer.quantize(col("embedding")))
        .as(Seq("idx", "qi")))
      .join(broadcast(comp), Seq("idx"))
      .groupBy("vec_id")
      .agg(sum(col("qi") * col("v")).as("proj"))
  }

  // ---- oracle twins -------------------------------------------------

  /** CTE chain ending in `pv(idx, v)` — the component after [[Iters]]
    * rounds, bit-identical to [[pc1]].
    */
  def sqlPc1: String = {
    val base =
      s"""qv AS (SELECT ${Quantizer.sqlQuantize("embedding")} AS q FROM embeddings),
         |gu AS (SELECT r1.range::BIGINT AS i, r2.range::BIGINT AS j,
         |    count(*)::DECIMAL(38,0) AS n,
         |    sum(q[r1.range + 1]::DECIMAL(38,0) * q[r2.range + 1]) AS sxy
         |  FROM qv CROSS JOIN range(${Quantizer.Dim}) r1
         |    CROSS JOIN range(${Quantizer.Dim}) r2
         |  WHERE r1.range <= r2.range GROUP BY 1, 2),
         |gup AS (SELECT i, j,
         |    ((CASE WHEN abs(sxy) > 9223372036854775807
         |           THEN error('embedding_pc1: gram cell exceeds the BIGINT accumulator bound')
         |           WHEN sxy < 0 THEN -1 ELSE 1 END) *
         |     (abs(sxy)::HUGEINT // n::HUGEINT))::BIGINT AS gm FROM gu),
         |g AS (SELECT i, j, gm FROM gup UNION ALL
         |      SELECT j AS i, i AS j, gm FROM gup WHERE i < j),
         |v0 AS (SELECT range::BIGINT AS idx, $VScale::BIGINT AS v
         |       FROM range(${Quantizer.Dim}))""".stripMargin
    val rounds = (1 to Iters).map { k =>
      val p = if (k == 1) "v0" else s"v${k - 1}"
      s"""u$k AS (SELECT g.i AS idx, sum(g.gm * v.v)::BIGINT AS u
         |  FROM g JOIN $p v ON g.j = v.idx GROUP BY 1),
         |m$k AS (SELECT (max(abs(u)) // $VScale) + 1 AS md FROM u$k),
         |v$k AS (SELECT idx,
         |  ((CASE WHEN u < 0 THEN -1 ELSE 1 END) * (abs(u) // md))::BIGINT AS v
         |  FROM u$k, m$k)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$rounds,\npv AS (SELECT idx, v FROM v$Iters)"
  }

  /** Full oracle for the projections key. */
  def sqlProjections: String =
    s"""WITH $sqlPc1,
       |e AS (SELECT vec_id, ${Quantizer.sqlQuantize("embedding")} AS q FROM embeddings),
       |x AS (SELECT vec_id, r.range::BIGINT AS idx, q[r.range + 1] AS qi
       |  FROM e CROSS JOIN range(${Quantizer.Dim}) r)
       |SELECT vec_id, sum(x.qi * pv.v)::BIGINT AS proj
       |FROM x JOIN pv ON x.idx = pv.idx
       |GROUP BY 1 ORDER BY vec_id""".stripMargin
}
