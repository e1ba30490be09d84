package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The published Gopher REPETITION gates (Rae et al. 2021, Appendix A1.1,
  * "repetitious text" table) — [[Gopher]]'s companion filter, char-exact:
  *
  *   - duplicate-line fraction ≤ 0.30; duplicate-line CHAR fraction ≤ 0.20
  *   - most-frequent 2/3/4-gram char fraction ≤ 0.20 / 0.18 / 0.16
  *   - duplicated (count > 1) 5..10-gram char fraction ≤ 0.15 .. 0.10
  *
  * Definitions (the public dedup implementations' convention): a line is
  * the [[Gopher.LineWidth]]-token wrap of the flat fixture text (its own
  * lines on a real corpus); an n-gram's char length is its joined form
  * (token chars + n−1 spaces); fractions are char-mass ratios —
  * `top_n = max_g count(g)·len(g) / Σ_g count(g)·len(g)` and
  * `dup_n = Σ_{count>1} count(g)·len(g) / Σ_g count(g)·len(g)` over all
  * (overlapping) position grams; dup-line fractions count every occurrence
  * of a line whose content appears more than once. All emitted as exact
  * ppm integers (x·10⁶ DIV mass), gates as integer comparisons.
  *
  * Scale shape: ONE generate of (doc, n, gram-hash, len) rows — gram rows
  * ≈ 10× token mass, the published filter's intrinsic cost — then two
  * hash aggregates (per-(doc, n, gram) counts, per-(doc, n) masses) and a
  * 10-rows-per-doc pivot. Grams travel as 64-bit hashes + char lengths,
  * never strings, so shuffle width is constant per row.
  */
object GopherRep {

  /** (n, threshold-ppm) for every gate; n = 1 encodes the line rules. */
  val TopThresholdsPpm: Map[Int, Long] =
    Map(2 -> 200000L, 3 -> 180000L, 4 -> 160000L)
  val DupThresholdsPpm: Map[Int, Long] =
    Map(1 -> 300000L, 5 -> 150000L, 6 -> 140000L, 7 -> 130000L,
      8 -> 120000L, 9 -> 110000L, 10 -> 100000L)
  val DupLineCharPpm = 200000L

  val Ns: Seq[Int] = 2 to 10

  def gates(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val id = col(idCol)
    val staged = df.select(id,
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(id, col("toks"), size(col("toks")).as("ntok"))
    val w = Gopher.LineWidth
    // lines ride as n = 1: joined slice of LineWidth tokens
    val lineGrams = expr(
      s"""transform(
         |  CASE WHEN ntok = 0 THEN array() ELSE sequence(0, (ntok - 1) div $w) END,
         |  i -> concat_ws(' ', slice(toks, i * $w + 1, $w)))"""
        .stripMargin.replace("\n", " "))
    // explode the n INDEX first, then build only that n's gram array per
    // (doc, n) row — building all 10 arrays inside one struct-array value
    // would transiently hold ~10x the document text in a single row
    // (review finding, round 8: executor OOM risk on huge docs, the exact
    // case this aggregate shape exists for)
    val gramsOfN = Ns.foldLeft(when(col("n") === 1, lineGrams)) { (acc, n) =>
      acc.when(col("n") === n, TextAnalysis.shingles(col("toks"), n))
    }
    val gramRows = staged
      .select(id, col("toks"), col("ntok"),
        explode(typedLit((1 +: Ns).toSeq)).as("n"))
      .select(id, col("n"), explode(gramsOfN).as("g"))
      .select(id, col("n"), xxhash64(col("g")).as("gh"),
        length(col("g")).cast("long").as("len"))
    val counts = gramRows.groupBy(id, col("n"), col("gh"))
      .agg(count(lit(1)).as("c"), min(col("len")).as("len"))
    val masses = counts.groupBy(id, col("n"))
      .agg(sum(col("c") * col("len")).as("mass"),
        sum(when(col("c") > 1, col("c") * col("len")).otherwise(0L)).as("dup_mass"),
        max(col("c") * col("len")).as("top_mass"),
        sum(col("c")).as("cnt"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_cnt"))
      .select(id, col("n"),
        expr("dup_mass * 1000000 DIV mass").as("dup_ppm"),
        expr("top_mass * 1000000 DIV mass").as("top_ppm"),
        expr("dup_cnt * 1000000 DIV cnt").as("dup_cnt_ppm"))
    // pivot the ≤10 rows per doc to one verdict row
    val agg = masses.groupBy(id).agg(
      max(when(col("n") === 1, col("dup_cnt_ppm"))).as("dup_line_ppm"),
      max(when(col("n") === 1, col("dup_ppm"))).as("dup_line_char_ppm"),
      max(when(col("n") === 2, col("top_ppm"))).as("top2_ppm"),
      max(when(col("n") === 3, col("top_ppm"))).as("top3_ppm"),
      max(when(col("n") === 4, col("top_ppm"))).as("top4_ppm"),
      max(when(col("n") === 5, col("dup_ppm"))).as("dup5_ppm"),
      max(when(col("n") === 6, col("dup_ppm"))).as("dup6_ppm"),
      max(when(col("n") === 7, col("dup_ppm"))).as("dup7_ppm"),
      max(when(col("n") === 8, col("dup_ppm"))).as("dup8_ppm"),
      max(when(col("n") === 9, col("dup_ppm"))).as("dup9_ppm"),
      max(when(col("n") === 10, col("dup_ppm"))).as("dup10_ppm"))
    // re-anchor on the FULL doc list: a zero-token doc generates no gram
    // rows at all and would otherwise vanish from the verdict (review
    // finding, round 8 — rowwiseGates and Gopher/C4 emit one row per doc,
    // and corpus_admit_published's join must not silently drop docs).
    // A doc too short for gram size n has no n rows -> the gate passes
    // vacuously (coalesce to 0), matching the paper's intent.
    val z = (c: String) => coalesce(col(c), lit(0L))
    df.select(id).join(agg, Seq(idCol), "left")
      .select((id +: agg.columns.tail.map(c => z(c).as(c))): _*)
      .withColumn("rep_pass",
        z("dup_line_ppm") <= DupThresholdsPpm(1) &&
          z("dup_line_char_ppm") <= DupLineCharPpm &&
          z("top2_ppm") <= TopThresholdsPpm(2) &&
          z("top3_ppm") <= TopThresholdsPpm(3) &&
          z("top4_ppm") <= TopThresholdsPpm(4) &&
          z("dup5_ppm") <= DupThresholdsPpm(5) &&
          z("dup6_ppm") <= DupThresholdsPpm(6) &&
          z("dup7_ppm") <= DupThresholdsPpm(7) &&
          z("dup8_ppm") <= DupThresholdsPpm(8) &&
          z("dup9_ppm") <= DupThresholdsPpm(9) &&
          z("dup10_ppm") <= DupThresholdsPpm(10))
  }

  /** Per-ROW form of [[gates]]: the same counters computed entirely with
    * higher-order functions inside one projection — no explode, no
    * shuffle, no state — so the full repetition filter is legal in an
    * append-mode stream (the winnow pattern: the aggregate shape for the
    * corpus, the per-row shape for ingest). Cost is O(L²) per document
    * per n (first-occurrence multiset counting), the right trade for
    * ingest-sized documents; the batch key keeps the aggregate shape,
    * which is what you want when single documents can be huge.
    * Output schema identical to [[gates]]; parity pinned in GopherRepSpec.
    */
  def rowwiseGates(df: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", carry: Seq[String] = Nil): DataFrame = {
    val id = col(idCol)
    val cc = carry.map(col)
    val w = Gopher.LineWidth
    val staged = df.select(id +: cc :+
        TextAnalysis.tokens(col(textCol)).as("toks"): _*)
      .select(id +: cc :+ col("toks") :+ size(col("toks")).as("ntok"): _*)
    // For gram array g: first-occurrence mask via array_position; counts
    // via filter-size; masses as integer folds. All one expression per n.
    def massTriple(gramsE: String): (String, String, String) = {
      // one (count·len) struct per FIRST-OCCURRENCE gram, computed once —
      // inlining the O(L) count into both the predicate and the product
      // would double the quadratic scan (review finding, round 8)
      val cl =
        s"transform(filter(sequence(1, size($gramsE)), i -> array_position($gramsE, element_at($gramsE, i)) = i), " +
          s"i -> struct(size(filter($gramsE, x -> x = element_at($gramsE, i))) AS c, " +
          s"length(element_at($gramsE, i)) AS l))"
      val mass =
        s"aggregate($gramsE, 0L, (a, x) -> a + length(x))"
      val dup =
        s"aggregate($cl, 0L, (a, e) -> a + (CASE WHEN e.c > 1 THEN CAST(e.c AS BIGINT) * e.l ELSE 0L END))"
      val top =
        s"aggregate($cl, 0L, (a, e) -> greatest(a, CAST(e.c AS BIGINT) * e.l))"
      (mass, dup, top)
    }
    def ppm(numE: String, denE: String): String =
      s"(CASE WHEN $denE = 0 THEN 0L ELSE $numE * 1000000L DIV $denE END)"
    val lineGramsE =
      s"transform(CASE WHEN ntok = 0 THEN array() ELSE sequence(0, (ntok - 1) div $w) END," +
        s" i -> concat_ws(' ', slice(toks, i * $w + 1, $w)))"
    val dupLineCnt =
      s"aggregate(transform(filter(sequence(1, size(LG)), " +
        s"i -> array_position(LG, element_at(LG, i)) = i), " +
        s"i -> size(filter(LG, x -> x = element_at(LG, i)))), " +
        s"0L, (a, c) -> a + (CASE WHEN c > 1 THEN CAST(c AS BIGINT) ELSE 0L END))"
    val (lm, ld, _) = massTriple("LG")
    val withLines = staged.withColumn("LG", expr(lineGramsE))
      .withColumn("dup_line_ppm",
        expr(ppm(dupLineCnt, "size(LG)")))
      .withColumn("dup_line_char_ppm", expr(ppm(ld, lm)))
    val withGrams = Ns.foldLeft(withLines) { (acc, n) =>
      val g = acc.withColumn(s"G$n", TextAnalysis.shingles(col("toks"), n))
      val (m, d, t) = massTriple(s"G$n")
      val g2 =
        if (n <= 4) g.withColumn(s"top${n}_ppm", expr(ppm(t, m)))
        else g.withColumn(s"dup${n}_ppm", expr(ppm(d, m)))
      g2.drop(s"G$n")
    }
    withGrams.select(id +: cc :+ col("dup_line_ppm") :+
        col("dup_line_char_ppm") :+
        col("top2_ppm") :+ col("top3_ppm") :+ col("top4_ppm") :+
        col("dup5_ppm") :+ col("dup6_ppm") :+ col("dup7_ppm") :+
        col("dup8_ppm") :+ col("dup9_ppm") :+ col("dup10_ppm"): _*)
      .withColumn("rep_pass",
        col("dup_line_ppm") <= DupThresholdsPpm(1) &&
          col("dup_line_char_ppm") <= DupLineCharPpm &&
          col("top2_ppm") <= TopThresholdsPpm(2) &&
          col("top3_ppm") <= TopThresholdsPpm(3) &&
          col("top4_ppm") <= TopThresholdsPpm(4) &&
          col("dup5_ppm") <= DupThresholdsPpm(5) &&
          col("dup6_ppm") <= DupThresholdsPpm(6) &&
          col("dup7_ppm") <= DupThresholdsPpm(7) &&
          col("dup8_ppm") <= DupThresholdsPpm(8) &&
          col("dup9_ppm") <= DupThresholdsPpm(9) &&
          col("dup10_ppm") <= DupThresholdsPpm(10))
  }

  /** DuckDB mirror of [[gates]] over the `documents` view. DuckDB's hash()
    * differs from xxhash64, but both sides only GROUP by the hash, so
    * grouping by the gram STRING here is value-identical.
    */
  def sqlGates: String = {
    val toks = TextAnalysis.sqlTokens("text")
    val w = Gopher.LineWidth
    val perN = Ns.map { n =>
      s"SELECT doc_id, $n AS n, unnest(${TextAnalysis.sqlShingles("toks", n)}) AS g FROM t"
    }.mkString("\n  UNION ALL ")
    def thr(c: String, t: Long) = s"coalesce($c, 0) <= $t"
    s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
       |lines AS (SELECT doc_id, 1 AS n,
       |  unnest([array_to_string(toks[i*$w+1 : i*$w+$w], ' ')
       |          for i in range((len(toks) + ${w - 1}) // $w)]) AS g FROM t),
       |grams AS ($perN UNION ALL SELECT * FROM lines),
       |counts AS (SELECT doc_id, n, g, count(*)::BIGINT AS c,
       |  length(g)::BIGINT AS len FROM grams GROUP BY 1, 2, 3),
       |masses AS (SELECT doc_id, n,
       |  (sum(CASE WHEN c > 1 THEN c * len ELSE 0 END) * 1000000
       |     // sum(c * len))::BIGINT AS dup_ppm,
       |  (max(c * len) * 1000000 // sum(c * len))::BIGINT AS top_ppm,
       |  (sum(CASE WHEN c > 1 THEN c ELSE 0 END) * 1000000
       |     // sum(c))::BIGINT AS dup_cnt_ppm
       |  FROM counts GROUP BY 1, 2),
       |p AS (SELECT doc_id,
       |  max(CASE WHEN n = 1 THEN dup_cnt_ppm END) AS dup_line_ppm,
       |  max(CASE WHEN n = 1 THEN dup_ppm END) AS dup_line_char_ppm,
       |  max(CASE WHEN n = 2 THEN top_ppm END) AS top2_ppm,
       |  max(CASE WHEN n = 3 THEN top_ppm END) AS top3_ppm,
       |  max(CASE WHEN n = 4 THEN top_ppm END) AS top4_ppm,
       |  max(CASE WHEN n = 5 THEN dup_ppm END) AS dup5_ppm,
       |  max(CASE WHEN n = 6 THEN dup_ppm END) AS dup6_ppm,
       |  max(CASE WHEN n = 7 THEN dup_ppm END) AS dup7_ppm,
       |  max(CASE WHEN n = 8 THEN dup_ppm END) AS dup8_ppm,
       |  max(CASE WHEN n = 9 THEN dup_ppm END) AS dup9_ppm,
       |  max(CASE WHEN n = 10 THEN dup_ppm END) AS dup10_ppm
       |  FROM masses GROUP BY 1)
       |SELECT d.doc_id,
       |  coalesce(dup_line_ppm, 0)::BIGINT AS dup_line_ppm,
       |  coalesce(dup_line_char_ppm, 0)::BIGINT AS dup_line_char_ppm,
       |  coalesce(top2_ppm, 0)::BIGINT AS top2_ppm,
       |  coalesce(top3_ppm, 0)::BIGINT AS top3_ppm,
       |  coalesce(top4_ppm, 0)::BIGINT AS top4_ppm,
       |  coalesce(dup5_ppm, 0)::BIGINT AS dup5_ppm,
       |  coalesce(dup6_ppm, 0)::BIGINT AS dup6_ppm,
       |  coalesce(dup7_ppm, 0)::BIGINT AS dup7_ppm,
       |  coalesce(dup8_ppm, 0)::BIGINT AS dup8_ppm,
       |  coalesce(dup9_ppm, 0)::BIGINT AS dup9_ppm,
       |  coalesce(dup10_ppm, 0)::BIGINT AS dup10_ppm,
       |  (${thr("dup_line_ppm", DupThresholdsPpm(1))}
       |   AND ${thr("dup_line_char_ppm", DupLineCharPpm)}
       |   AND ${thr("top2_ppm", TopThresholdsPpm(2))}
       |   AND ${thr("top3_ppm", TopThresholdsPpm(3))}
       |   AND ${thr("top4_ppm", TopThresholdsPpm(4))}
       |   AND ${thr("dup5_ppm", DupThresholdsPpm(5))}
       |   AND ${thr("dup6_ppm", DupThresholdsPpm(6))}
       |   AND ${thr("dup7_ppm", DupThresholdsPpm(7))}
       |   AND ${thr("dup8_ppm", DupThresholdsPpm(8))}
       |   AND ${thr("dup9_ppm", DupThresholdsPpm(9))}
       |   AND ${thr("dup10_ppm", DupThresholdsPpm(10))}) AS rep_pass
       |FROM documents d LEFT JOIN p ON d.doc_id = p.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }
}
