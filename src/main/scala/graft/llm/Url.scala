package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL / metadata-level deduplication — the standard stage-0 of web-corpus
  * pipelines (CCNet / FineWeb / RefinedWeb all run URL dedup BEFORE any
  * content hashing: re-crawls and per-session query strings replicate the
  * same page many times, and dropping them on the canonical URL is a pure
  * string groupBy, orders of magnitude cheaper than MinHash).
  *
  * Canonicalization (the CCNet recipe, pure Column math → codegen'd):
  *   1. strip the fragment (`#...`) — client-side only, never a distinct page;
  *   2. strip the query string (`?...`) — session/tracking junk (`utm_*`);
  *   3. strip the scheme (`http://`/`https://`/any RFC-3986 scheme) —
  *      protocol is not identity;
  *   4. lowercase the host (DNS is case-insensitive; paths stay as-is,
  *      they are case-sensitive per RFC) and drop a leading `www.` plus a
  *      default `:80`/`:443` port;
  *   5. strip trailing `/` runs from the path.
  *
  * Scale notes (100 TB): canonicalize is per-row scalar work inside
  * whole-stage codegen; the dedup itself is one hash aggregate on the
  * canonical string (skew-free: hot hosts differ in path). The keep/drop
  * verdict (min doc_id per canonical URL — the same owner convention as
  * [[Dedup]] / [[Substring]]) joins back on doc_id, so it composes with
  * `corpus_clean`'s per-doc verdicts with zero extra passes.
  *
  * Reference scope: the reference pipeline has no web-corpus operators;
  * this extends the engine for the LLM-pipeline north star.
  */
object Url {

  /** Canonical form of a URL-shaped string (see object doc for the rules).
    * Pure `Column` regex chain — no UDF.
    */
  def canonical(u: Column): Column = {
    val noFrag   = regexp_replace(u, "#.*$", "")
    val noQuery  = regexp_replace(noFrag, "\\?.*$", "")
    val noScheme = regexp_replace(noQuery, "^[a-zA-Z][a-zA-Z0-9+.\\-]*://", "")
    val host = regexp_replace(
      regexp_replace(lower(regexp_extract(noScheme, "^([^/]*)", 1)), "^www\\.", ""),
      ":(80|443)$", "")
    val path = regexp_replace(regexp_extract(noScheme, "^[^/]*(/.*)?$", 1), "/+$", "")
    concat(host, path)
  }

  /** DuckDB mirror of [[canonical]] over a SQL expression `u`. DuckDB's
    * `regexp_replace` is first-match-only by default — every pattern here
    * is anchored or suffix-greedy, so one match is the only match.
    */
  def sqlCanonical(u: String): String = {
    val noFrag   = s"regexp_replace($u, '#.*$$', '')"
    val noQuery  = s"regexp_replace($noFrag, '\\?.*$$', '')"
    val noScheme = s"regexp_replace($noQuery, '^[a-zA-Z][a-zA-Z0-9+.-]*://', '')"
    val host = s"regexp_replace(regexp_replace(lower(regexp_extract($noScheme, '^([^/]*)', 1)), '^www\\.', ''), ':(80|443)$$', '')"
    val path = s"regexp_replace(regexp_extract($noScheme, '^[^/]*(/.*)?$$', 1), '/+$$', '')"
    s"($host || $path)"
  }

  /** Subdomain labels cycling on `(doc_id % 50) / 10` — host-count fan-out
    * so domain-level operators (`domain_caps`, `split_domain_disjoint`) see
    * ~|sources| × 5 canonical hosts instead of |sources|. The index is a
    * function of the `% 50` residue, so docs agreeing on (source,
    * doc_id % 50) — the designed collision groups — always share a host;
    * and it is NOT determined by the fixture's source cycle (source tracks
    * doc_id % 20, and the decade index varies within each mod-20 class),
    * which a plain `% 5` index would be (5 divides 20). None of the labels
    * is `www` (that prefix canonicalizes away).
    */
  val Subdomains: Seq[String] = Seq("news", "blog", "docs", "shop", "forum")

  /** DuckDB mirror of the subdomain pick (list literal indexed by residue). */
  private val sqlSubdomain: String =
    s"(['${Subdomains.mkString("','")}'])[((doc_id % 50) // 10)::INTEGER + 1]"

  /** The fixture's `documents` table carries no raw URL column, so the key
    * derives one deterministically from (source, doc_id) — mixed-case
    * scheme/host, `www.` prefixes, tracking query strings, fragments,
    * default ports, and trailing slashes all cycle on doc_id residues so
    * every canonicalization rule is exercised; docs agreeing on
    * (source, doc_id % 50) collide post-canonicalization (the subdomain
    * index is itself a function of the `% 50` residue, so the fan-out
    * never splits a collision group). Mirrored exactly by
    * [[sqlSyntheticUrl]].
    */
  def syntheticUrl(docId: Column, source: Column): Column = {
    val scheme = when(pmod(docId, lit(3)) === 0, lit("https://"))
      .when(pmod(docId, lit(3)) === 1, lit("HTTP://"))
      .otherwise(lit("HTTPS://"))
    val www  = when(pmod(docId, lit(2)) === 0, lit("WWW.")).otherwise(lit(""))
    val sub  = element_at(typedlit(Subdomains),
      (pmod(docId, lit(50)) / lit(10)).cast("int") + 1)
    val host = when(pmod(docId, lit(5)) === 0,
        concat(upper(sub), lit("."), upper(source), lit(".EXAMPLE.COM")))
      .otherwise(concat(sub, lit("."), source, lit(".example.com")))
    val port = when(pmod(docId, lit(11)) === 0, lit(":443")).otherwise(lit(""))
    val path  = concat(lit("/page/"), pmod(docId, lit(50)).cast("string"))
    val slash = when(pmod(docId, lit(6)) === 0, lit("/")).otherwise(lit(""))
    val query = when(pmod(docId, lit(4)) === 0,
      concat(lit("?utm_source=feed&session="), docId.cast("string"))).otherwise(lit(""))
    val frag = when(pmod(docId, lit(7)) === 0, lit("#section-2")).otherwise(lit(""))
    concat(scheme, www, host, port, path, slash, query, frag)
  }

  /** DuckDB mirror of [[syntheticUrl]] over `documents` columns. */
  val sqlSyntheticUrl: String =
    s"""(CASE doc_id % 3 WHEN 0 THEN 'https://' WHEN 1 THEN 'HTTP://' ELSE 'HTTPS://' END
      | || CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END
      | || CASE WHEN doc_id % 5 = 0
      |         THEN upper(${sqlSubdomain}) || '.' || upper(source) || '.EXAMPLE.COM'
      |         ELSE ${sqlSubdomain} || '.' || source || '.example.com' END
      | || CASE WHEN doc_id % 11 = 0 THEN ':443' ELSE '' END
      | || '/page/' || (doc_id % 50)::VARCHAR
      | || CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END
      | || CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&session=' || doc_id::VARCHAR ELSE '' END
      | || CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END)"""
      .stripMargin.replace("\n", "")

  /** Canonical host (registrable domain analog) of a URL-shaped string —
    * the group key of domain-level operators (`domain_caps`,
    * `split_domain_disjoint`).
    */
  def canonicalHost(u: Column): Column =
    regexp_extract(canonical(u), "^([^/]*)", 1)

  /** DuckDB mirror of [[canonicalHost]]. */
  def sqlCanonicalHost(u: String): String =
    s"regexp_extract(${sqlCanonical(u)}, '^([^/]*)', 1)"

  /** URL-level dedup verdict: per doc its raw URL, canonical URL, the
    * canonical group size, and `keep` (min doc_id per canonical URL — the
    * owner convention). Joinable with `corpus_clean` on doc_id.
    */
  def dedupUrl(docs: DataFrame): DataFrame =
    dedupUrlOn(docs, syntheticUrl(col("doc_id"), col("source")))

  /** [[dedupUrl]] over an arbitrary URL expression — the entry point a
    * real deployment uses with its crawl-metadata column.
    */
  def dedupUrlOn(docs: DataFrame, url: Column): DataFrame = {
    // one scan + one regex pass: the canonicalized frame is materialized
    // once (localCheckpoint — the signatureIndex contract) and feeds both
    // the group aggregate and the verdict join; without the cut the plan
    // re-scans documents and re-runs the whole regex chain per consumer
    val withUrl = docs.select(col("doc_id"), url.as("url"))
      .withColumn("canon_url", canonical(col("url")))
      .localCheckpoint()
    val groups = withUrl.groupBy("canon_url")
      .agg(count(lit(1)).as("n_dup"), min(col("doc_id")).as("owner"))
    withUrl.join(groups, Seq("canon_url"))
      .select(col("doc_id"), col("url"), col("canon_url"), col("n_dup"),
        (col("doc_id") === col("owner")).as("keep"))
  }

  /** DuckDB mirror of [[dedupUrl]]. */
  val sqlDedupUrl: String =
    s"""WITH u AS (SELECT doc_id, $sqlSyntheticUrl AS url FROM documents),
       |c AS (SELECT doc_id, url, ${sqlCanonical("url")} AS canon_url FROM u),
       |g AS (SELECT canon_url, count(*)::BIGINT AS n_dup, min(doc_id) AS owner
       |      FROM c GROUP BY 1)
       |SELECT c.doc_id, c.url, c.canon_url, g.n_dup,
       |  (c.doc_id = g.owner) AS keep
       |FROM c JOIN g ON c.canon_url = g.canon_url
       |ORDER BY c.doc_id""".stripMargin
}
