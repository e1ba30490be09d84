package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the warehouse/governance key batch: SCD2
  * interval algebra, k-anonymity accounting, seasonal-baseline math, and
  * compaction-bin packing. The oracle hash check proves value equality;
  * these prove the CONTRACTS the values are supposed to satisfy.
  */
class WarehouseOpsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("scd2_history: versions are 1..N per user and intervals tile the timeline") {
    val h = SparkEntry.queries("scd2_history")(spark, d).collect()
    assert(h.nonEmpty)
    val byUser = h.groupBy(_.getAs[Long]("user_id"))
    for ((u, rows) <- byUser) {
      val sorted = rows.sortBy(_.getAs[Long]("ver"))
      assert(sorted.map(_.getAs[Long]("ver")).toSeq == (1L to sorted.length).toSeq,
        s"user $u: versions must be a 1..N run")
      // consecutive versions chain: valid_to of run k == valid_from of k+1;
      // only the last run is open (-1)
      for (Array(a, b) <- sorted.sliding(2).map(_.toArray)) {
        assert(a.getAs[Long]("valid_to") == b.getAs[Long]("valid_from"),
          s"user $u: intervals must chain without gaps")
        assert(a.getAs[String]("event_type") != b.getAs[String]("event_type"),
          s"user $u: consecutive runs must change type (else not a change run)")
      }
      assert(sorted.last.getAs[Long]("valid_to") == -1L,
        s"user $u: last version must be open-ended")
      assert(sorted.init.forall(_.getAs[Long]("valid_to") >= 0L))
    }
  }

  test("scd2_history: run event counts sum to the user's event count") {
    val h = SparkEntry.queries("scd2_history")(spark, d)
      .groupBy("user_id").agg(sum("n_events").as("n")).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n")).toMap
    val e = Tables.events(spark, d).groupBy("user_id").count().collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    assert(h == e, "every event must land in exactly one run")
  }

  test("k_anonymity: histogram accounts for every customer exactly once") {
    val rep = SparkEntry.queries("k_anonymity")(spark, d).collect()
    val total = rep.map(r => r.getAs[Long]("n_users")).sum
    val nCust = Tables.customer(spark, d).count()
    assert(total == nCust, "sum(k_size * n_groups) must equal the row count")
    assert(rep.forall(r =>
      r.getAs[Long]("n_users") == r.getAs[Long]("k_size") * r.getAs[Long]("n_groups")))
    assert(rep.forall(r => (r.getAs[Long]("k_size") < 5L) == (r.getAs[Int]("at_risk") == 1)),
      "at_risk flag must match the k threshold")
  }

  test("events_seasonal: baseline ppm is the exact integer mean over training days") {
    val rows = SparkEntry.queries("events_seasonal")(spark, d).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val base = r.getAs[Long]("base_cnt"); val nd = r.getAs[Long]("n_train_days")
      assert(r.getAs[Long]("baseline_ppm") == base * 1000000L / nd)
      assert(r.getAs[Long]("resid_ppm") ==
        r.getAs[Long]("actual_cnt") * 1000000L - r.getAs[Long]("baseline_ppm"))
      assert(r.getAs[Long]("hod") >= 0L && r.getAs[Long]("hod") < 24L)
    }
  }

  test("compaction_plan: bins partition the file listing into contiguous runs") {
    val bins = SparkEntry.queries("compaction_plan")(spark, d).collect()
      .sortBy(_.getAs[Long]("bin"))
    assert(bins.nonEmpty)
    // contiguity: each bin's file range starts right after the previous
    for (Array(a, b) <- bins.sliding(2).map(_.toArray)) {
      assert(a.getAs[Long]("last_file") + 1 == b.getAs[Long]("first_file"),
        "bins must cover the listing in contiguous file_id order")
    }
    val nFiles = bins.map(_.getAs[Long]("n_files")).sum
    val distinctFiles = Tables.documents(spark, d)
      .select((col("doc_id") - pmod(col("doc_id"), lit(8L))).as("f")).distinct().count()
    assert(nFiles == distinctFiles, "every file assigned to exactly one bin")
    // start-offset binning: a bin only exceeds the target by at most the
    // size of its last (straddling) file, so every bin except possibly the
    // last must have started before its target boundary filled
    for (b <- bins.init) {
      assert(b.getAs[Long]("total_bytes") > 0L)
    }
  }

  test("join_scd2: every event matches exactly one version — its own run") {
    val j = SparkEntry.queries("join_scd2")(spark, d)
    val nEvents = Tables.events(spark, d).count()
    assert(j.count() == nEvents, "interval tiling ⇒ exactly one version per event")
    // the version active at an event's ts is the run CONTAINING the event,
    // so the dimension type must equal the event's own type
    val mismatch = j.join(
        Tables.events(spark, d).select(col("event_id"), col("event_type")),
        Seq("event_id"))
      .filter(col("dim_type") =!= col("event_type")).count()
    assert(mismatch == 0L)
  }

  test("join_scd2: tied timestamps across a type change still join their own run") {
    // ts-only intervals would be EMPTY for the first run here, dropping
    // event 1 into its successor's version — the composite (ts, event_id)
    // ordinate keeps the contract (regression for the tie-collision edge)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tie").toString
    Seq(
      (1L, 1000L, 7L, "click"),  // run 1: one event at ts=1000
      (2L, 1000L, 7L, "view"),   // run 2 starts at the SAME ts
      (3L, 2000L, 7L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
      .write.parquet(s"$dir/events.parquet")
    val j = SparkEntry.queries("join_scd2")(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("ver"), r.getAs[String]("dim_type"))).toMap
    assert(j(1L) == (1L, "click"), s"tied-ts event must join its own run: $j")
    assert(j(2L) == (2L, "view") && j(3L) == (2L, "view"))
    assert(j.size == 3)
  }

  test("cdc_changelog: one row per user; I exactly for users born on the last day") {
    val c = SparkEntry.queries("cdc_changelog")(spark, d).collect()
    val users = Tables.events(spark, d).select("user_id").distinct().count()
    assert(c.length.toLong == users)
    val e = Tables.events(spark, d)
    val maxd = e.select(floor(col("ts") / lit(86400L * 1000000000L)).as("day"))
      .agg(max("day")).head().getLong(0)
    val oldUsers = e.filter(floor(col("ts") / lit(86400L * 1000000000L)) < maxd)
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    for (r <- c) {
      val isNew = !oldUsers(r.getAs[Long]("user_id"))
      assert((r.getAs[String]("op") == "I") == isNew)
      if (isNew) assert(r.getAs[String]("old_type") == "")
      else assert((r.getAs[String]("op") == "=") ==
        (r.getAs[String]("old_type") == r.getAs[String]("new_type")))
    }
  }

  test("stats_corr: matches Spark's built-in corr on the unscaled doubles") {
    val got = SparkEntry.queries("stats_corr")(spark, d).collect()
      .map(r => (r.getAs[String]("xcol"), r.getAs[String]("ycol")) ->
        r.getAs[Double]("corr_r")).toMap
    assert(got.size == 6)
    assert(got.values.forall(v => v >= -1.0 && v <= 1.0))
    val li = Tables.lineitem(spark, d)
    val names = Map("q" -> "l_quantity", "p" -> "l_extendedprice",
      "dc" -> "l_discount", "tx" -> "l_tax")
    for (((x, y), v) <- got) {
      val ref = li.agg(corr(col(names(x)), col(names(y)))).head().getDouble(0)
      // built-in corr runs unscaled float sums; the exact-integer path
      // differs only by quantization (1e-4 of the value range)
      assert(math.abs(v - ref) < 1e-3, s"($x,$y): $v vs builtin $ref")
    }
  }
}
