package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sparse lexical retrieval — the inverted-index complement of the dense
  * (embedding) similarity family: tf-idf and BM25 ranking over per-doc
  * top-M term postings, scored entirely in EXACT integer/decimal
  * arithmetic so the DuckDB oracle replays every value bit-for-bit.
  *
  * Exactness design: idf is the RAW RATIO `(N · 1e6) div df` (integer
  * ppm), not a float log — ln would put an order-sensitive float sum in
  * the score; BM25's saturation is the classic k1/b formula evaluated in
  * scaled-integer `div` arithmetic. Pair scores are decimal sums of
  * integer products (order-independent), scaled back to BIGINT.
  *
  * Scale shape: one tokenize pass builds the (doc, term, tf) index
  * (checkpointed — the [[TextAnalysis.tfidfTopK]] / SignatureIndex
  * pattern); the per-doc TOP-M gate (window per doc — bounded) plus the
  * DISCRIMINATION CAP (drop terms in > half the docs) bound the postings
  * join: a term's posting list is short unless the term is rare-ish, and
  * rare terms have few postings — the WAND-style argument that keeps
  * lexical retrieval linear-ish at corpus scale. The join is a plain
  * equi-join on the term, shuffled by term — no row leaves the executors
  * except the k·|queries| result.
  */
object Sparse {

  /** Per-doc top-M discriminative-term postings with ppm idf and doc
    * length: (doc_id, t, tf, idf_ppm, dl). Terms present in more than
    * [[DfCapPpm]] of docs (90% — effectively-everywhere boilerplate) are
    * dropped BEFORE the top-M gate: their posting lists ARE the corpus
    * and they carry no discrimination. The cap is deliberately loose;
    * the organic scale control is the idf-weighted top-M gate itself —
    * a common term has low idf, so it rarely makes any doc's top-M and
    * its posting list stays short even though it passed the cap.
    */
  val TopM = 8
  val DfCapPpm = 900000L

  /** Impact-ordered per-TERM posting cap: after the per-doc top-M gate,
    * keep only the [[MaxPostings]] highest-weight postings of each term
    * (weight desc, doc_id tie). On a Zipf corpus the top-M gate already
    * keeps lists short and this cap is inactive; on a FLAT vocabulary
    * (few terms shared by everyone — the adversarial shape, measured as
    * a 52× wall at the 10× replica before the cap) every term's list is
    * the corpus and the term join goes quadratic. The cap bounds join
    * fan-out at |terms|·P·|query postings| — the classic impact-ordered
    * index trade: retrieval under mega-posting terms becomes top-P
    * approximate, deterministically, and the oracle replays the same
    * truncation.
    */
  val MaxPostings = 1024

  def postings(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint() // feeds df, N, dl, and the scored index
    val dfq = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val n = tf.select(countDistinct(col("doc_id")).as("n_docs"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("w").desc, col("t"))
    val wTerm = Window.partitionBy("t").orderBy(col("w").desc, col("doc_id"))
    tf.join(dfq, "t").crossJoin(broadcast(n))
      .filter(col("df") * 1000000L <= col("n_docs") * DfCapPpm)
      .withColumn("idf_ppm", expr("(n_docs * 1000000) div df"))
      .join(dl, "doc_id")
      .withColumn("w", col("tf") * col("idf_ppm"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopM)
      .withColumn("trnk", row_number().over(wTerm))
      .filter(col("trnk") <= MaxPostings)
      .select("doc_id", "t", "tf", "idf_ppm", "dl")
  }

  /** tf-idf pair scores between query docs (isQuery on doc_id) and the
    * corpus through the shared postings: top-k by
    * `Σ_t tf_q·tf_d·idf_ppm²` (decimal-exact, scaled to BIGINT div 1e6).
    */
  def topK(docs: DataFrame, isQuery: org.apache.spark.sql.Column,
           k: Int): DataFrame = {
    val p = postings(docs).localCheckpoint() // both sides of the term join
    val q = p.filter(isQuery)
      .select(col("doc_id").as("q_id"), col("t"), col("tf").as("tf_q"))
    val pairs = q.join(p, Seq("t"))
      .filter(col("q_id") =!= col("doc_id"))
      .groupBy(col("q_id"), col("doc_id").as("n_id"))
      .agg(sum(expr(
        "CAST(tf_q AS DECIMAL(38,0)) * tf * idf_ppm * idf_ppm")).as("s"))
      .select(col("q_id"), col("n_id"),
        expr("CAST(s div 1000000 AS BIGINT)").as("score"))
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("n_id"))
    pairs.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Ungated exact tf-idf top-k — the brute-force correctness baseline
    * for [[topK]]'s gated index (no top-M, no df cap, no posting cap):
    * every shared term contributes. Quadratic in the flat-vocab worst
    * case BY DESIGN — the sample-only exact path, same adjudication as
    * `similarity_topk` for the dense family. Scores use the identical
    * rational-idf formula so the two rankings are directly comparable.
    */
  def exactTopK(docs: DataFrame, isQuery: org.apache.spark.sql.Column,
                k: Int): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfq = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val n = tf.select(countDistinct(col("doc_id")).as("n_docs"))
    val p = tf.join(dfq, "t").crossJoin(broadcast(n))
      .withColumn("idf_ppm", expr("(n_docs * 1000000) div df"))
      .select("doc_id", "t", "tf", "idf_ppm")
      .localCheckpoint() // both sides of the term join
    val q = p.filter(isQuery)
      .select(col("doc_id").as("q_id"), col("t"), col("tf").as("tf_q"))
    val pairs = q.join(p, Seq("t"))
      .filter(col("q_id") =!= col("doc_id"))
      .groupBy(col("q_id"), col("doc_id").as("n_id"))
      .agg(sum(expr(
        "CAST(tf_q AS DECIMAL(38,0)) * tf * idf_ppm * idf_ppm")).as("s"))
      .select(col("q_id"), col("n_id"),
        expr("CAST(s div 1000000 AS BIGINT)").as("score"))
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("n_id"))
    pairs.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** BM25 scaled-integer parameters: k1 = 1.2 and b = 0.75, both ×1000. */
  val K1x1000 = 1200L
  val Bx1000 = 750L

  /** BM25 top-k: same postings and join geometry as [[topK]], with the
    * per-term weight saturated by the classic k1/b length normalization,
    * evaluated in scaled-integer `div` arithmetic:
    * `w = idf_ppm · (tf·(k1+1)·1000) div (tf·1000 + k1·((1000−b) + (b·dl·1000) div (avgdl·1000) ))`
    * (all quantities ×1000; avgdl enters as total/ndocs in exact ints).
    */
  def bm25TopK(docs: DataFrame, isQuery: org.apache.spark.sql.Column,
               k: Int): DataFrame = {
    val p = postings(docs).localCheckpoint()
    val tot = p.select(col("doc_id"), col("dl")).distinct()
      .agg(sum("dl").as("sum_dl"), count(lit(1)).as("nd"))
    val weighted = p.crossJoin(broadcast(tot))
      .withColumn("lennorm_x1000",
        lit(1000L - Bx1000) +
          expr(s"($Bx1000 * dl * nd) div sum_dl"))
      .withColumn("w_d", expr(
        s"(idf_ppm * (tf * ${K1x1000 + 1000L})) div (tf * 1000 + ($K1x1000 * lennorm_x1000) div 1000)"))
    // classic BM25 treats the query as a term SET (no query-side tf)
    val q = weighted.filter(isQuery)
      .select(col("doc_id").as("q_id"), col("t"))
    val pairs = q.join(weighted, Seq("t"))
      .filter(col("q_id") =!= col("doc_id"))
      .groupBy(col("q_id"), col("doc_id").as("n_id"))
      .agg(sum(expr("CAST(w_d AS DECIMAL(38,0))")).as("s"))
      .select(col("q_id"), col("n_id"), expr("CAST(s AS BIGINT)").as("score"))
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("n_id"))
    pairs.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  // ---- oracle twins -------------------------------------------------

  /** CTE chain ending in `pidx(doc_id, t, tf, idf_ppm, dl)`. */
  def sqlPostings: String = {
    val toks = TextAnalysis.sqlTokens("text")
    s"""tok AS (SELECT doc_id, unnest($toks) AS t FROM documents),
       |tfx AS (SELECT doc_id, t, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
       |dfx AS (SELECT t, count(*)::BIGINT AS df FROM tfx GROUP BY 1),
       |nx AS (SELECT count(DISTINCT doc_id)::BIGINT AS n_docs FROM tfx),
       |dlx AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tfx GROUP BY 1),
       |sc AS (SELECT tfx.doc_id, tfx.t, tfx.tf,
       |    (nx.n_docs * 1000000) // dfx.df AS idf_ppm, dlx.dl,
       |    tfx.tf * ((nx.n_docs * 1000000) // dfx.df) AS w
       |  FROM tfx JOIN dfx USING (t) CROSS JOIN nx JOIN dlx USING (doc_id)
       |  WHERE dfx.df * 1000000 <= nx.n_docs * $DfCapPpm),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
       |    ORDER BY w DESC, t) AS prnk FROM sc),
       |tm AS (SELECT *, row_number() OVER (PARTITION BY t
       |    ORDER BY w DESC, doc_id) AS trnk
       |  FROM rk WHERE prnk <= $TopM),
       |pidx AS (SELECT doc_id, t, tf, idf_ppm, dl FROM tm
       |  WHERE trnk <= $MaxPostings)""".stripMargin
  }

  /** [[topK]]'s oracle as a composable CTE chain ending in
    * `out(q_id, n_id, score, rnk)`.
    */
  def sqlTopKCte(queryPred: String => String, k: Int, out: String): String =
    s"""$sqlPostings,
       |qx AS (SELECT doc_id AS q_id, t, tf AS tf_q FROM pidx
       |  WHERE ${queryPred("doc_id")}),
       |px AS (SELECT q_id, p.doc_id AS n_id,
       |    (sum(tf_q::HUGEINT * p.tf * p.idf_ppm * p.idf_ppm) // 1000000)::BIGINT
       |      AS score
       |  FROM qx JOIN pidx p USING (t) WHERE q_id <> p.doc_id GROUP BY 1, 2),
       |rx AS (SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY score DESC, n_id) AS rnk FROM px),
       |$out AS (SELECT q_id, n_id, score, rnk FROM rx WHERE rnk <= $k)""".stripMargin

  def sqlTopK(queryPred: String => String, k: Int): String =
    s"""WITH ${sqlTopKCte(queryPred, k, "topk_")}
       |SELECT q_id, n_id, score, rnk FROM topk_
       |ORDER BY q_id, rnk""".stripMargin

  /** [[exactTopK]]'s oracle as a CTE chain (distinct CTE names, so it
    * composes with [[sqlTopKCte]] in one statement) ending in
    * `out(q_id, n_id, score, rnk)`.
    */
  def sqlExactTopKCte(queryPred: String => String, k: Int, out: String): String = {
    val toks = TextAnalysis.sqlTokens("text")
    s"""etok AS (SELECT doc_id, unnest($toks) AS t FROM documents),
       |etf AS (SELECT doc_id, t, count(*)::BIGINT AS tf FROM etok GROUP BY 1, 2),
       |edf AS (SELECT t, count(*)::BIGINT AS df FROM etf GROUP BY 1),
       |enx AS (SELECT count(DISTINCT doc_id)::BIGINT AS n_docs FROM etf),
       |ep AS (SELECT etf.doc_id, etf.t, etf.tf,
       |    (enx.n_docs * 1000000) // edf.df AS idf_ppm
       |  FROM etf JOIN edf USING (t) CROSS JOIN enx),
       |eqx AS (SELECT doc_id AS q_id, t, tf AS tf_q FROM ep
       |  WHERE ${queryPred("doc_id")}),
       |epx AS (SELECT q_id, p.doc_id AS n_id,
       |    (sum(tf_q::HUGEINT * p.tf * p.idf_ppm * p.idf_ppm) // 1000000)::BIGINT
       |      AS score
       |  FROM eqx JOIN ep p USING (t) WHERE q_id <> p.doc_id GROUP BY 1, 2),
       |erx AS (SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY score DESC, n_id) AS rnk FROM epx),
       |$out AS (SELECT q_id, n_id, score, rnk FROM erx WHERE rnk <= $k)""".stripMargin
  }

  def sqlBm25TopK(queryPred: String => String, k: Int): String =
    s"""WITH $sqlPostings,
       |tx AS (SELECT sum(dl)::BIGINT AS sum_dl, count(*)::BIGINT AS nd
       |  FROM (SELECT DISTINCT doc_id, dl FROM pidx)),
       |wx AS (SELECT pidx.*,
       |    (idf_ppm * (tf * ${K1x1000 + 1000L})) //
       |      (tf * 1000 + ($K1x1000 *
       |        ((${1000L - Bx1000}) + ($Bx1000 * dl * tx.nd) // tx.sum_dl))
       |        // 1000) AS w_d
       |  FROM pidx, tx),
       |qx AS (SELECT doc_id AS q_id, t FROM wx
       |  WHERE ${queryPred("doc_id")}),
       |px AS (SELECT q_id, w.doc_id AS n_id,
       |    sum(w.w_d::HUGEINT)::BIGINT AS score
       |  FROM qx JOIN wx w USING (t) WHERE q_id <> w.doc_id GROUP BY 1, 2),
       |rx AS (SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY score DESC, n_id) AS rnk FROM px)
       |SELECT q_id, n_id, score, rnk FROM rx WHERE rnk <= $k
       |ORDER BY q_id, rnk""".stripMargin
}
