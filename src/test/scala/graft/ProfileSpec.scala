package graft

import graft.ops.Profile

/** One-pass column profiling: metric correctness and the one-scan shape. */
class ProfileSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Some("a"), Some(10)),
      (2L, Some("b"), None),
      (3L, None, Some(10)),
      (4L, Some("a"), Some(30))
    ).toDF("id", "s", "v")
  }

  test("profile: exact counts, nulls, distincts, min/max strings per column") {
    val rows = Profile.profile(df, Seq("id", "s", "v")).collect()
      .map(r => r.getString(0) -> r).toMap
    val id = rows("id")
    assert(id.getLong(1) == 4 && id.getLong(2) == 0 && id.getLong(3) == 4 &&
      id.getLong(4) == 4 && id.getString(5) == "1" && id.getString(6) == "4")
    val s = rows("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 3 && s.getLong(4) == 2 &&
      s.getString(5) == "a" && s.getString(6) == "b")
    val v = rows("v")
    assert(v.getLong(2) == 1 && v.getLong(4) == 2 &&
      v.getString(5) == "10" && v.getString(6) == "30")
  }

  test("profile: one PRUNED scan per column, never the Expand multi-distinct") {
    // the one-scan/N-count_distinct plan copies EVERY row |cols|+1 times
    // with all columns aboard (Expand) — measured 10× slower than pruned
    // per-column scans at sf0.1; this pins the union-of-pruned-scans shape
    val d = "/root/testdata/sf0.001"
    val plan = SparkEntry.queries("stats_profile")(spark, d)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"profile must not take the Expand multi-distinct path:\n$plan")
    val reads = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(reads.nonEmpty)
    assert(reads.forall(r => !r.contains(",")),
      s"every profile scan must read exactly one column, got: $reads")
  }
}
