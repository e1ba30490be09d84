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
}
