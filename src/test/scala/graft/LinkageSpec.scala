package graft

import graft.ops.Linkage

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def cust(rows: (Long, String, Int)*) =
    rows.toSeq.toDF("c_custkey", "c_name", "c_nationkey")

  test("withVariants: one deterministic typo class per custkey mod 3") {
    val base = cust(
      (30L, "Customer#000000030", 1), // 30 % 3 = 0 -> deletion
      (40L, "Customer#000000040", 1), // 40 % 3 = 1 -> substitution
      (50L, "Customer#000000050", 1), // 50 % 3 = 2 -> insertion
      (31L, "Customer#000000031", 1)) // not a 10th key -> no variant
    val v = Linkage.withVariants(base).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v.size == 7)
    assert(v(-31L) == "Custmer#000000030")
    assert(v(-41L) == "Customer@000000040")
    assert(v(-51L) == "Customerr#000000050")
    assert(!v.contains(-32L))
  }

  test("blockedPairs: variants match their originals at distance 1") {
    val out = Linkage.blockedPairs(cust(
        (30L, "Customer#000000030", 1),
        (40L, "Customer#000000040", 2),
        (50L, "Customer#000000050", 3)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4),
        r.getBoolean(5), r.getBoolean(6)))
    assert(out.toSet == Set(
      (-31L, 30L, 1, true, true),
      (-41L, 40L, 1, true, true),
      (-51L, 50L, 1, true, true)))
  }

  test("blockedPairs: suffix collision surfaces as an is_match false positive") {
    // 13 and 10013 share nation + suffix "0013"; serial names differ by one
    // substitution -> the rule calls it a match, ground truth says no.
    val out = Linkage.blockedPairs(cust(
        (13L, "Customer#000000013", 5),
        (10013L, "Customer#000010013", 5)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4),
        r.getBoolean(5), r.getBoolean(6)))
    assert(out.toSet == Set((13L, 10013L, 1, true, false)))
  }

  test("entities: chains merge to one entity id; unmatched stand alone") {
    // 10 and 10010 share block (nation 1, suffix "0010") and both spawn
    // variants -> {10, 10010, -11, -10011} consolidate to one entity id,
    // the component minimum -10011. 77 matches nothing -> its own entity.
    val out = Linkage.entities(cust(
        (10L, "Customer#000000010", 1),
        (10010L, "Customer#000010010", 1),
        (77L, "Customer#000000077", 1)))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(10L) == ((-10011L, false)))
    assert(out(10010L) == ((-10011L, false)))
    assert(out(-11L) == ((-10011L, false)))
    assert(out(-10011L) == ((-10011L, true)))
    assert(out(77L) == ((77L, true)))
    assert(out.size == 5)
  }

  test("blockedPairs: different blocks never pair") {
    val out = Linkage.blockedPairs(cust(
      (1L, "Customer#000000001", 1),
      (2L, "Customer#000000002", 1),   // same nation, different suffix
      (10001L, "Customer#000010001", 2))) // same suffix as 1, other nation
    assert(out.count() == 0)
  }
}
