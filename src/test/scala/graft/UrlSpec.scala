package graft

import graft.llm.Url
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level dedup verdict. */
class UrlSpec extends SparkSpec {

  private def canon(raw: String): String = {
    import spark.implicits._
    Seq(raw).toDF("u").select(Url.canonical(col("u")).as("c"))
      .collect().head.getString(0)
  }

  test("canonical: scheme/fragment/query/port/www stripped, host lowercased") {
    assert(canon("HTTPS://WWW.Src1.Example.COM:443/page/3?utm=x#frag")
      == "src1.example.com/page/3")
    assert(canon("http://example.com") == "example.com")
    assert(canon("example.com/a/") == "example.com/a", "schemeless input ok")
    assert(canon("https://host.com/a///") == "host.com/a", "trailing-slash runs")
  }

  test("canonical: path case is preserved (case-sensitive per RFC); host is not") {
    assert(canon("https://HOST.com/Path/To/X") == "host.com/Path/To/X")
  }

  test("canonical: non-default port and real query-less URLs survive intact") {
    assert(canon("https://host.com:8080/a") == "host.com:8080/a")
    assert(canon("host.com") == "host.com")
  }

  test("dedupUrl: same page under different scheme-case/junk collapses; min doc keeps") {
    import spark.implicits._
    // doc 3 and doc 53, same source: residues give different scheme case but
    // identical canonical URL (page 3); doc 7 is alone on page 7.
    val df = Seq((3L, "src9"), (53L, "src9"), (7L, "src9"))
      .toDF("doc_id", "source")
    val out = Url.dedupUrl(df).collect().map(r => r.getLong(0) -> r).toMap
    // subdomain cycles on (doc_id % 50) / 10: decade 0 for both 3 and 53 ->
    // "news" — a function of the % 50 residue, so collisions survive
    assert(out(3L).getString(2) == "news.src9.example.com/page/3")
    assert(out(3L).getString(2) == out(53L).getString(2), "canonicals collide")
    assert(out(3L).getString(1) != out(53L).getString(1), "raw urls differ")
    assert(out(3L).getLong(3) == 2L && out(53L).getLong(3) == 2L)
    assert(out(3L).getBoolean(4) && !out(53L).getBoolean(4), "min doc keeps")
    assert(out(7L).getLong(3) == 1L && out(7L).getBoolean(4))
  }

  test("syntheticUrl: every canonicalization rule is exercised across residues") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, s"src${i % 20}")).toDF("doc_id", "source")
    val urls = df.select(Url.syntheticUrl(col("doc_id"), col("source")).as("u"))
      .collect().map(_.getString(0))
    assert(urls.exists(_.contains("#")) && urls.exists(_.contains("?")) &&
      urls.exists(_.contains(":443")) && urls.exists(_.startsWith("HTTP://")) &&
      urls.exists(_.contains("WWW.")) && urls.exists(_.contains(".EXAMPLE.COM")))
  }

  test("split_domain_disjoint: domains partition cleanly and masses reconcile") {
    val out = SparkEntry.queries("split_domain_disjoint")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty && out.length <= 3)
    val domainsTotal = out.head.getLong(4)
    assert(out.map(_.getLong(4)).distinct.length == 1, "global total in every row")
    // disjointness: per-split domain counts sum to the global distinct count
    assert(out.map(_.getLong(2)).sum == domainsTotal)
    assert(out.map(_.getLong(1)).sum > 0, "docs assigned")
  }

  test("quality_by_domain: exact re-derivation from per-doc quality and hosts") {
    val d = "/root/testdata/sf0.001"
    val perDoc = Tables.documents(spark, d)
      .select(Url.canonicalHost(
          Url.syntheticUrl(col("doc_id"), col("source"))).as("host"),
        size(graft.llm.TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"),
        round(graft.llm.TextAnalysis.qualityScore(col("text")) * 1000000L, 0)
          .cast("long").as("q_ppm"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byHost = perDoc.groupBy(_._1).map { case (h, rs) =>
      h -> (rs.length.toLong, rs.map(_._2).sum, rs.map(_._3).sum / rs.length)
    }
    val gq = perDoc.map(_._3).sum / perDoc.length
    val rows = SparkEntry.queries("quality_by_domain")(spark, d).collect()
    assert(rows.length == byHost.size, "one row per canonical host")
    rows.foreach { r =>
      val (h, n, t, m, f) = (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))
      val (en, et, em) = byHost(h)
      assert(n == en && t == et && m == em, s"host $h aggregates")
      assert(f == (em < gq - 10000L && en >= 3L), s"host $h flag")
    }
    assert(rows.exists(_.getBoolean(4)) && rows.exists(!_.getBoolean(4)),
      "review list is neither empty nor everything")
  }

  test("dedup_bloom_gate: no false negatives, both batch populations present") {
    val rows = SparkEntry.queries("dedup_bloom_gate")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    // the Bloom contract: a true duplicate can never miss the filter
    rows.foreach { case (id, hit, dup) =>
      assert(hit || !dup, s"doc $id: true_dup=$dup must imply bloom_hit")
    }
    // the fixture batch exercises both sides: re-crawled URLs (must hit)
    // and never-seen pages (may only hit as false positives)
    assert(rows.exists(_._3), "batch contains re-crawled URLs")
    assert(rows.exists(r => !r._3), "batch contains never-seen URLs")
    // the gate is useful: at least one never-seen doc passes the filter
    // untouched (otherwise every doc would fall through to the join)
    assert(rows.exists(r => !r._2), "some never-seen docs skip the join")
  }

  test("canonicalHost: subdomain fan-out yields |sources| x 5 hosts, case-folded") {
    import spark.implicits._
    val df = (0L until 200L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val hosts = df.select(Url.canonicalHost(
        Url.syntheticUrl(col("doc_id"), col("source"))).as("h"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(hosts.size == 20, s"4 sources x 5 decade-subdomains, got ${hosts.size}")
    assert(hosts.forall(h => h == h.toLowerCase), "hosts are case-folded")
    assert(hosts.forall(h => Url.Subdomains.exists(s => h.startsWith(s + "."))))
  }
}
