package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the map-view fan-out makes skew structural
  * in this engine: the ALL view (`0:0`) carries EVERY record
  * (`MapKeysUDF.java:115`), so any aggregation or join keyed by mapKey has
  * one key holding the entire dataset. AQE's skew handling only covers
  * sort-merge JOIN splits; skewed AGGREGATION and broadcast-ineligible
  * joins need explicit salting.
  *
  * All spreads are deterministic (hash of a high-cardinality column, never
  * `rand()`): results stay reproducible and oracle-comparable.
  */
object Skew {

  /** Two-phase aggregation for algebraic aggregates over skewed keys:
    * phase 1 groups by (keys..., spread) — splitting a hot key across
    * `factor` reducers — phase 2 merges. `spread` must be a deterministic
    * high-cardinality expression (e.g. a record id).
    *
    * `partials`: aggregates valid for both phases (count is NOT — pass
    * `sum`/`min`/`max`-style merges and build counts as sums of 1).
    */
  def saltedAgg(
      df: DataFrame, keys: Seq[String], spread: Column, factor: Int)(
      phase1: Seq[Column], phase2: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(spread), lit(factor)))
    val p1 = salted.groupBy((keys :+ "__salt").map(col): _*).agg(phase1.head, phase1.tail: _*)
    p1.groupBy(keys.map(col): _*).agg(phase2.head, phase2.tail: _*)
  }

  /** Skew-resilient inner equi-join of a skewed left side against a
    * moderate right side that is too large to broadcast: the left side gets
    * a deterministic salt in [0, factor); the right side is replicated
    * `factor` times; the join key becomes (key, salt), so a hot key's rows
    * spread over `factor` reducers instead of one.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String,
      spread: Column, factor: Int): DataFrame = {
    val l = left.withColumn("__salt", pmod(hash(spread), lit(factor)))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Key-size distribution histogram — the report run BEFORE choosing a
    * salt factor: group sizes binned into power-of-two buckets
    * (`bucket = floor(log2 n)` via exact bit arithmetic — `length(bin(n)) - 1`;
    * a float log2 would flip bucket boundaries at exact powers of two
    * across engines). One aggregation over group sizes; the histogram is
    * ≤64 rows at any scale.
    */
  def sizeHistogram(df: DataFrame, key: String): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n"))
      .groupBy((length(bin(col("n"))) - 1).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_keys"), sum("n").as("n_rows"), max("n").as("max_n"))

  /** DuckDB mirror of [[sizeHistogram]] over `fromE` (a table or CTE name)
    * keyed by `keyE`. Subquery form (no WITH) so it composes after a
    * caller's own CTE prefix.
    */
  def sqlSizeHistogram(fromE: String, keyE: String): String =
    s"""SELECT (length(bin(n)) - 1)::BIGINT AS bucket, count(*)::BIGINT AS n_keys,
       |  sum(n)::BIGINT AS n_rows, max(n)::BIGINT AS max_n
       |FROM (SELECT $keyE AS k, count(*)::BIGINT AS n FROM $fromE GROUP BY 1)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Per-heavy-key salt plan: keys whose row count exceeds `mult`× the mean
    * get `salt = ceil(n / T)` with `T = (mult · total) div n_keys` — the
    * factor [[saltedAgg]]/[[saltedJoin]] would need to spread that key to
    * mean-sized reducer shares. Exact integer arithmetic end to end (mean
    * via `div`, ceil via `(n + T - 1) div T`) so any engine reproduces the
    * plan. The threshold rides a 1-row broadcast cross join — the
    * established totals pattern; output is only the heavy tail.
    */
  def saltPlan(df: DataFrame, key: String, mult: Long): DataFrame = {
    val sizes = df.groupBy(key).agg(count(lit(1)).as("n"))
      .localCheckpoint() // feeds the totals AND the heavy-tail filter
    val tot = sizes.agg(sum("n").as("total"), count(lit(1)).as("n_keys"))
    sizes.crossJoin(broadcast(tot))
      .withColumn("thr", expr(s"($mult * total) div n_keys"))
      .filter(col("n") > col("thr"))
      .select(col(key), col("n"), col("thr"),
        expr("(n + thr - 1) div thr").as("salt"))
  }

  /** DuckDB mirror of [[saltPlan]], subquery form (composes after a
    * caller's CTE prefix).
    */
  def sqlSaltPlan(fromE: String, keyE: String, mult: Long): String =
    s"""SELECT $keyE, n, thr, ((n + thr - 1) // thr)::BIGINT AS salt
       |FROM (
       |  SELECT sz.$keyE, sz.n, (($mult * tt.total) // tt.n_keys)::BIGINT AS thr
       |  FROM (SELECT $keyE, count(*)::BIGINT AS n FROM $fromE GROUP BY 1) sz,
       |       (SELECT sum(n)::BIGINT AS total, count(*)::BIGINT AS n_keys
       |        FROM (SELECT count(*)::BIGINT AS n FROM $fromE GROUP BY $keyE)) tt
       |)
       |WHERE n > thr ORDER BY $keyE""".stripMargin
}
