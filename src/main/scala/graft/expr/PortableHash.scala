package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic string hash computable identically in Spark SQL and in the
  * DuckDB oracle: the first 8 hex digits of md5 interpreted as a BIGINT
  * (range [0, 2^32)).
  *
  * The reference salts HBase keys with `hash(key) % modulus`
  * (`HBaseKeyUDF.java:45-47` via gbif ModulusSalt); the concrete hash there
  * is a JVM detail. Our engine pins a *portable* hash so the correctness
  * oracle can recompute it — and so any engine (Spark, DuckDB, Trino…)
  * reading our outputs can re-derive partitioning. md5 is overkill
  * cryptographically but is the one hash every SQL engine shares, and at
  * 100 TB it is computed on post-aggregation rows only (tile keys, doc ids),
  * never on the raw-scan hot path.
  */
object PortableHash {

  /** Hash of a string column → BIGINT in [0, 2^32). */
  def phash(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast(LongType)

  /** Seeded variant: family of independent hash functions (minhash perms). */
  def phashSeed(seed: Int, c: Column): Column =
    phash(concat(lit(seed.toString + ":"), c))

  /** DuckDB SQL emitting the same value as [[phash]] applied to `e`. */
  def sqlPhash(e: String): String =
    s"(('0x' || substr(md5($e), 1, 8))::BIGINT)"

  /** DuckDB SQL for [[phashSeed]]. */
  def sqlPhashSeed(seed: Int, e: String): String =
    sqlPhash(s"('$seed:' || $e)")

  /** JVM-side (plan-build-time) evaluation of [[phash]] — for deriving
    * deterministic literal constants that are baked into plans and oracle
    * SQL (minhash permutations, shingle-combo multipliers).
    */
  def phashLocal(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }
}
