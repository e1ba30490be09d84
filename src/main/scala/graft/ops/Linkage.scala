package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage) over a relational entity table:
  * deterministic blocking + in-block edit-distance verification — the
  * classic MDM/dedup workload (Fellegi-Sunter style pipeline with a
  * deterministic comparison rule).
  *
  * Fixture note: TPC-H customers are clean, so [[withVariants]] first
  * synthesizes a "dirty" twin for every 10th customer (variant key
  * −(k+1) — a fixed offset would collide with real custkeys at large
  * SF, and plain −k collides with itself at k = 0; −(k+1) ≤ −1 is
  * collision-free at any scale — name carrying one deterministic typo
  * class per `custkey mod 3`) — precedent: `pii_redact`'s synthesized
  * contact strings. The output carries `same_entity` ground truth
  * (a variant pairs its original iff a + b = −1), so the
  * key doubles as a precision audit of the blocking + distance rule:
  * `is_match` without `same_entity` is exactly the false-positive a
  * suffix-block + edit-2 rule produces on near-identical serial names.
  *
  * Scale shape: blocking is an equi-key self-join on
  * (nation, name-suffix-4) — block occupancy is bounded by the key's
  * cardinality (nation × 10⁴ suffixes), the LSH-bucket posture, never
  * all-pairs; the verify is a per-row levenshtein on ≤18-char strings.
  * At 100 TB both sides shuffle on the same block key; no broadcast
  * assumption, no skew cell (serial names spread suffixes uniformly).
  */
object Linkage {

  val MatchMaxDist = 2
  /** Every `VariantMod`-th customer spawns a dirty twin — the ONE owner of
    * the ground-truth rule; er_quality's recall denominator counts with it.
    */
  val VariantMod = 10

  /** Originals ∪ deterministic dirty variants (every 10th customer). */
  def withVariants(customers: DataFrame): DataFrame = {
    val typo = when(pmod(col("c_custkey"), lit(3)) === 0,
        expr("replace(c_name, 'Customer#', 'Custmer#')"))   // deletion
      .when(pmod(col("c_custkey"), lit(3)) === 1,
        expr("replace(c_name, '#', '@')"))                  // substitution
      .otherwise(expr("replace(c_name, 'Customer', 'Customerr')")) // insertion
    val variants = customers.filter(pmod(col("c_custkey"), lit(VariantMod)) === 0)
      .select((-col("c_custkey") - 1).as("c_custkey"),
        typo.as("c_name"), col("c_nationkey"))
    customers.select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .unionByName(variants)
  }

  /** Blocked candidate pairs with the edit verdict and ground truth. */
  def blockedPairs(customers: DataFrame): DataFrame = {
    val e = withVariants(customers)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        substring(col("c_name"), -4, 4).as("blk_suffix"))
    val a = e.select(col("c_custkey").as("a"), col("c_name").as("name_a"),
      col("c_nationkey"), col("blk_suffix"))
    val b = e.select(col("c_custkey").as("b"), col("c_name").as("name_b"),
      col("c_nationkey"), col("blk_suffix"))
    a.join(b, Seq("c_nationkey", "blk_suffix"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("c_nationkey"), col("blk_suffix"),
        levenshtein(col("name_a"), col("name_b")).as("edit_dist"))
      .withColumn("is_match", col("edit_dist") <= MatchMaxDist)
      .withColumn("same_entity", col("a") + col("b") === -1)
      .orderBy("a", "b")
  }

  /** CTE bodies shared by the `er_blocking` / `er_entities` oracles:
    * `lkv` = originals ∪ variants, `lkp` = blocked verified pairs.
    */
  def sqlPairsCtes: String =
    s"""lkv AS (
       |  SELECT c_custkey, c_name, c_nationkey FROM customer
       |  UNION ALL
       |  SELECT -c_custkey - 1,
       |    CASE WHEN c_custkey % 3 = 0 THEN replace(c_name, 'Customer#', 'Custmer#')
       |         WHEN c_custkey % 3 = 1 THEN replace(c_name, '#', '@')
       |         ELSE replace(c_name, 'Customer', 'Customerr') END,
       |    c_nationkey
       |  FROM customer WHERE c_custkey % $VariantMod = 0),
       |lke AS (SELECT c_custkey, c_name, c_nationkey,
       |        right(c_name, 4) AS blk_suffix FROM lkv),
       |lkp AS (SELECT x.c_custkey AS a, y.c_custkey AS b,
       |  x.c_nationkey, x.blk_suffix,
       |  levenshtein(x.c_name, y.c_name)::INTEGER AS edit_dist,
       |  (levenshtein(x.c_name, y.c_name) <= $MatchMaxDist) AS is_match,
       |  (x.c_custkey + y.c_custkey = -1) AS same_entity
       |FROM lke x JOIN lke y
       |  ON x.c_nationkey = y.c_nationkey AND x.blk_suffix = y.blk_suffix
       | AND x.c_custkey < y.c_custkey)""".stripMargin

  /** DuckDB mirror of [[blockedPairs]] over the `customer` view. */
  def sqlBlockedPairs: String =
    s"WITH $sqlPairsCtes\nSELECT * FROM lkp ORDER BY a, b"

  /** Consolidated entities: every record (original or variant) labeled
    * with its entity id — the minimum custkey reachable through is_match
    * pairs (connected components over the match graph; unmatched records
    * are their own entity). Engine side rides [[graft.llm.Dedup.clusters]]'
    * alternating large/small-star CC — iteration count is log(diameter),
    * per-round cost edge-proportional, no driver state.
    */
  def entities(customers: DataFrame): DataFrame = {
    val pairs = blockedPairs(customers).filter(col("is_match")).select("a", "b")
    val cl = graft.llm.Dedup.clusters(pairs)
      .select(col("doc_id").as("rec_id"), col("cluster_id").as("ent"))
    withVariants(customers).select(col("c_custkey").as("rec_id"))
      .join(cl, Seq("rec_id"), "left")
      .select(col("rec_id"),
        coalesce(col("ent"), col("rec_id")).as("entity_id"))
      .withColumn("is_canonical", col("rec_id") === col("entity_id"))
      .orderBy("rec_id")
  }

  /** DuckDB mirror of [[entities]] (recursive-CTE connected components —
    * fine at oracle scale, the engine side is the distributed CC).
    */
  def sqlEntities: String =
    s"""WITH RECURSIVE $sqlPairsCtes,
       |me AS (SELECT a, b FROM lkp WHERE is_match
       |       UNION ALL SELECT b, a FROM lkp WHERE is_match),
       |reach AS (
       |  SELECT a AS id, b AS r FROM me
       |  UNION
       |  SELECT reach.id, me.b FROM reach JOIN me ON reach.r = me.a),
       |cl AS (SELECT id, least(id, min(r)) AS ent FROM reach GROUP BY id)
       |SELECT lkv.c_custkey AS rec_id,
       |  COALESCE(cl.ent, lkv.c_custkey) AS entity_id,
       |  (COALESCE(cl.ent, lkv.c_custkey) = lkv.c_custkey) AS is_canonical
       |FROM lkv LEFT JOIN cl ON lkv.c_custkey = cl.id
       |ORDER BY rec_id""".stripMargin
}
