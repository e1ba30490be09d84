package graft

import graft.ops.{Acf, RichClub}

/** Hand fixtures for the two bounded-grid structure screens added in
  * round 9: rich-club density and hourly autocorrelation.
  */
class StructureScreensSpec extends SparkSpec {
  import spark.implicits._

  test("richClub: star + one hub-hub edge forms a complete k=1 club; tiny clubs read NULL") {
    // degrees: 1->3, 2->2, 3->2, 4->1
    val edges = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L).toDF("a", "b")
    val rows = RichClub.richClub(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    // k=1: members {1,2,3}, all 3 possible edges present -> phi = 1e6
    assert(rows(1L) == ((3L, 3L, 1000000L)), rows.toString)
    // k=2: only node 1 qualifies -> phi undefined
    assert(rows(2L) == ((1L, 0L, -1L)), rows.toString)
    assert(rows(32L) == ((0L, 0L, -1L)), "empty thresholds still emit grid rows")
  }

  test("acf: a linear ramp is perfectly autocorrelated; a constant series pins 0") {
    val hourly = (
      (0L to 5L).map(h => ("ramp", h, h + 1)) ++
      (0L to 5L).map(h => ("flat", h, 5L))
    ).toDF("event_type", "hr", "c")
    val rows = Acf.acf(hourly).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(rows(("ramp", 1L)) == ((5L, 1.0)), rows.toString)
    assert(rows(("ramp", 3L)) == ((3L, 1.0)), rows.toString)
    assert(rows(("flat", 1L)) == ((5L, 0.0)), "zero variance pins 0")
    // lag 24 exceeds the 6-hour span: no observed pair, no row
    assert(!rows.contains(("ramp", 24L)))
  }

  test("acf: a period-2 alternating series reads -1 at lag 1 and +1 at lag 2") {
    val hourly = (0L to 7L).map(h => ("alt", h, if (h % 2 == 0) 10L else 2L))
      .toDF("event_type", "hr", "c")
    val rows = Acf.acf(hourly).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(rows(1L) == -1.0 && rows(2L) == 1.0, rows.toString)
  }
}
