package graft.operators

import graft.GraftSuite

/** Bin-bucketed range join semantics: bounds, bin spanning, overlap,
  * degenerate intervals.
  */
class RangeJoinSpec extends GraftSuite {
  import spark.implicits._

  private lazy val points = Seq(
    (1L, 5L), (2L, 10L), (3L, 19L), (4L, 20L), (5L, 35L), (6L, 100L)
  ).toDF("p_id", "p")

  private lazy val intervals = Seq(
    (10L, 10L, 20L), // [10, 20): matches p=10, 19; NOT 20 (exclusive end)
    (20L, 0L, 40L),  // spans several bins, overlaps the first: matches 5,10,19,20,35
    (30L, 50L, 50L), // degenerate: matches nothing
    (40L, 90L, 101L) // matches 100
  ).toDF("i_id", "s", "e")

  test("inclusive start, exclusive end, overlapping intervals, multi-bin spans") {
    val out = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", binWidth = 8L)
      .select("i_id", "p_id").as[(Long, Long)].collect().toSet
    assert(out === Set(
      (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L), (20L, 3L), (20L, 4L), (20L, 5L),
      (40L, 6L)))
  }

  test("each matching (point, interval) pair appears exactly once despite binning") {
    val out = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", binWidth = 3L)
    assert(out.count() === out.dropDuplicates("p_id", "i_id").count())
  }

  test("huge binWidth degrades gracefully to a single bucket") {
    val out = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", binWidth = 1000000L)
      .select("i_id", "p_id").as[(Long, Long)].collect().toSet
    assert(out.size === 8)
  }
}
