package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Publish / retention contract for generational outputs — the engine-side
  * model of the reference's finalize workflow
  * (`/root/reference/src/main/java/org/gbif/maps/workflow/FinaliseBackfill.java`):
  *
  *   - generations are fully-written tables named
  *     `{prefix}_{mode}_{yyyyMMdd_HHmm}` (the reference's timestamped HBase
  *     tables, `FinaliseBackfill.java:152-155`; written here by
  *     `MapPipeline.CatalogBarrier`'s CTAS — complete before they are ever
  *     visible to a reader);
  *   - going live is an ATOMIC POINTER SWAP: the reference updates a ZK
  *     metastore entry per mode (`updateMeta`, `FinaliseBackfill.java:64-85`);
  *     here the pointer is a catalog view `{prefix}_{mode}_current`
  *     repointed with `CREATE OR REPLACE VIEW` — a single metadata
  *     operation, so a reader resolves either the old or the new COMPLETE
  *     table, never a partial one;
  *   - retention keeps the NEWEST TWO generations per mode
  *     (`cleanup`, `FinaliseBackfill.java:132-211`), defensively never
  *     dropping a table that is the publish target or currently referenced
  *     by any mode's live pointer (the reference re-reads the metastore
  *     before each drop for the same reason).
  */
object Finalize {

  /** `\d{8}_\d{4}` — the reference's table-name timestamp suffix
    * (`FinaliseBackfill.java:154`). Lexicographic order == time order.
    */
  private val StampRe = "\\d{8}_\\d{4}"

  def tableName(prefix: String, mode: String, stamp: String): String = {
    require(stamp.matches(StampRe), s"stamp must be yyyyMMdd_HHmm, got: $stamp")
    s"${prefix}_${mode}_$stamp"
  }

  def viewName(prefix: String, mode: String): String =
    s"${prefix}_${mode}_current"

  /** Swap the live pointer of `mode` to the generation `stamp`. Refuses if
    * the generation table does not exist — publishing must happen strictly
    * AFTER the CTAS completed, which is what keeps readers away from
    * partial data.
    */
  def publish(spark: SparkSession, db: String, prefix: String, mode: String,
              stamp: String): Unit = {
    val t = tableName(prefix, mode, stamp)
    require(spark.catalog.tableExists(s"$db.$t"),
      s"cannot publish $db.$t: generation table not written yet")
    spark.sql(s"CREATE OR REPLACE VIEW $db.${viewName(prefix, mode)} " +
      s"AS SELECT * FROM $db.$t")
  }

  /** The generation table the live pointer of `mode` currently resolves to
    * (None when the mode was never published). Read from the ANALYZED view
    * plan — the same resolution a reader gets — not from parsing SQL text.
    */
  def currentTarget(spark: SparkSession, db: String, prefix: String,
                    mode: String): Option[String] = {
    val v = s"$db.${viewName(prefix, mode)}"
    if (!spark.catalog.tableExists(v)) None
    // Try: a DANGLING pointer (base table dropped out-of-band) fails view
    // analysis with TABLE_OR_VIEW_NOT_FOUND — that must read as "no live
    // target", not crash cleanup() for every other mode in the prefix.
    else scala.util.Try(spark.table(v).queryExecution.analyzed.collect {
      case r: LogicalRelation => r.catalogTable.map(_.identifier.table)
    }.flatten.headOption).toOption.flatten
  }

  /** All generation tables of `mode`, oldest → newest. */
  def generations(spark: SparkSession, db: String, prefix: String,
                  mode: String): Seq[String] =
    spark.catalog.listTables(db).collect().map(_.name)
      // Pattern.quote: a prefix/mode containing regex metacharacters (e.g.
      // "maps.v2") must match literally, not as a wildcard that could sweep
      // up — and cleanup() could then DROP — another deployment's tables
      .filter(_.matches(
        s"${java.util.regex.Pattern.quote(s"${prefix}_${mode}_")}$StampRe"))
      .sorted.toSeq

  /** Drop all but the newest `keep` generations of `mode`, never dropping a
    * table any `{prefix}_*_current` pointer references (defensive in-use
    * check, `FinaliseBackfill.java:168-177`). Returns the dropped names.
    */
  def cleanup(spark: SparkSession, db: String, prefix: String, mode: String,
              keep: Int = 2): Seq[String] = {
    val live: Set[String] = spark.catalog.listTables(db).collect()
      .map(_.name)
      .filter(_.matches(s"${java.util.regex.Pattern.quote(s"${prefix}_")}\\w+_current"))
      .toSeq
      .flatMap { v =>
        val m = v.stripPrefix(s"${prefix}_").stripSuffix("_current")
        currentTarget(spark, db, prefix, m)
      }.toSet
    val doomed = generations(spark, db, prefix, mode)
      .dropRight(math.max(keep, 0))
      .filterNot(live.contains)
    doomed.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $db.$t"))
    doomed
  }
}
