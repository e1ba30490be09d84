package graft

import graft.ops.Jaccard

class JaccardSpec extends SparkSpec {
  import spark.implicits._

  private def adj(rows: (Long, Long)*) = rows.toSeq.toDF("u", "w")

  test("similarPairs: exact jaccard over shared witnesses") {
    // u1: {10, 11, 12}; u2: {10, 11, 13}; u3: {12} -> (1,2) share {10, 11},
    // jac = 2 / (3 + 3 - 2) = 0.5; u3 never reaches minCommon.
    val out = Jaccard.similarPairs(
        adj((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 11L), (2L, 13L),
          (3L, 12L)),
        maxWitnessDeg = 10, minCommon = 2, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    assert(out.toSeq == Seq((1L, 2L, 2L, 0.5)))
  }

  test("similarPairs: hub witnesses drop from counts AND neighborhoods") {
    // witness 99 touches all three users (deg 3 > cap 2): it must neither
    // count as common nor inflate the union. Without the neighborhood
    // filter (1,2) would score 2/(4+4-2); with it, 2/(3+3-2) = 0.5.
    val out = Jaccard.similarPairs(
        adj((1L, 10L), (1L, 11L), (1L, 12L), (1L, 99L),
          (2L, 10L), (2L, 11L), (2L, 13L), (2L, 99L),
          (3L, 14L), (3L, 99L)),
        maxWitnessDeg = 2, minCommon = 2, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.toSeq == Seq((1L, 2L, 2L, 3L, 3L, 0.5)))
  }

  test("similarPairs: topK keeps the highest scores on the total order") {
    // (1,2) share {10,11} with |N'| = 2 each -> jac 1.0;
    // (4,5) share {20,21} of 3 -> jac 0.5; topK = 1 keeps only (1,2).
    val rows = adj((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L),
      (4L, 20L), (4L, 21L), (4L, 22L), (5L, 20L), (5L, 21L), (5L, 23L))
    val top1 = Jaccard.similarPairs(rows, maxWitnessDeg = 10, minCommon = 2,
      topK = 1).collect()
    assert(top1.map(r => (r.getLong(0), r.getLong(1), r.getDouble(5))).toSeq
      == Seq((1L, 2L, 1.0)))
  }
}
