package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Map-view fan-out (reference: `MapKeysUDF.java:99-151`).
  *
  * Each record belongs to N logical "map views", each identified by a
  * `"<typeCode>:<id>"` string: ALL (always `0:0`), one per non-null taxon
  * rank key, dataset, publisher, country, publishing country, and one per
  * network key. The reference computes this in a JVM `UDF13` returning
  * `String[]` — invisible to Catalyst. We build the same array with native
  * `Column` ops (`array`/`transform`/`filter`/`array_distinct`) so the whole
  * fan-out stays in whole-stage codegen and columns feeding it remain
  * prunable/pushable at a 100 TB scan.
  *
  * Set semantics: the reference collects into a `HashSet`
  * (`MapKeysUDF.java:114`) — duplicates (e.g. the same id at two taxon
  * ranks) collapse; we mirror with `array_distinct`. Nulls are skipped
  * (`appendNonNull`, `MapKeysUDF.java:149-151`) — `concat` null-propagates
  * and the final `filter` drops them.
  */
object MapKeys {

  /** Type codes, `MapKeysUDF.java:68-79` ("maintain backwards compatible keys"). */
  val ALL = 0; val TAXON = 1; val DATASET = 2; val PUBLISHER = 3
  val COUNTRY = 4; val PUBLISHING_COUNTRY = 5; val NETWORK = 6

  /** Array of map-view keys for one record. `networks` must be
    * `array<string>` (nullable).
    */
  def mapKeys(
      taxa: Seq[Column],
      dataset: Column,
      publisher: Column,
      country: Column,
      pubCountry: Column,
      networks: Column): Column = {
    val scalarKeys =
      lit(s"$ALL:0") +:
        taxa.map(t => concat(lit(s"$TAXON:"), t.cast("string"))) :+
        concat(lit(s"$DATASET:"), dataset.cast("string")) :+
        concat(lit(s"$PUBLISHER:"), publisher.cast("string")) :+
        concat(lit(s"$COUNTRY:"), country.cast("string")) :+
        concat(lit(s"$PUBLISHING_COUNTRY:"), pubCountry.cast("string"))
    val networkKeys =
      transform(coalesce(networks, array()), n => concat(lit(s"$NETWORK:"), n))
    array_distinct(
      filter(concat(array(scalarKeys: _*), networkKeys), k => k.isNotNull))
  }

  /** DuckDB SQL building the same list (element order irrelevant — callers
    * always explode/unnest). `taxaE` etc. are SQL expressions.
    */
  def sqlMapKeys(
      taxaE: Seq[String],
      datasetE: String,
      publisherE: String,
      countryE: String,
      pubCountryE: String,
      networksE: String): String = {
    val scalar =
      (s"'$ALL:0'" +:
        taxaE.map(t => s"('$TAXON:' || ($t)::VARCHAR)") :+
        s"('$DATASET:' || ($datasetE)::VARCHAR)" :+
        s"('$PUBLISHER:' || ($publisherE)::VARCHAR)" :+
        s"('$COUNTRY:' || ($countryE)::VARCHAR)" :+
        s"('$PUBLISHING_COUNTRY:' || ($pubCountryE)::VARCHAR)").mkString(", ")
    s"list_distinct(list_filter(list_concat([$scalar], " +
      s"[('$NETWORK:' || n) for n in COALESCE($networksE, [])]), x -> x IS NOT NULL))"
  }
}
