package graft.operators

import graft.GraftSuite

/** Key-skew diagnostics: heavy-hitter ranking/share and the exact log2
  * group-size histogram (power-of-two boundaries land in the right
  * bucket — the double-log misbucketing the binary-length trick avoids).
  */
class ProfileSpec extends GraftSuite {
  import spark.implicits._

  // One hot key (64 rows), one warm (8), three singletons: 75 rows.
  private lazy val skewed = (
    Seq.fill(64)(("hot", 1)) ++ Seq.fill(8)(("warm", 1)) ++
      Seq(("a", 1), ("b", 1), ("c", 1))
  ).toDF("k", "v")

  test("heavyKeys ranks by count with key tiebreak and reports exact shares") {
    val top = Profile.heavyKeys(skewed, Seq("k"), topN = 3)
      .select("k", "n_rows", "share", "rnk")
      .as[(String, Long, Double, Int)].collect().toList
    assert(top === List(
      ("hot", 64L, 64.0 / 75, 1),
      ("warm", 8L, 8.0 / 75, 2),
      ("a", 1L, 1.0 / 75, 3))
      .map { case (k, n, s, r) => (k, n, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, r) })
  }

  test("keySizeHistogram buckets exact powers of two correctly") {
    val h = Profile.keySizeHistogram(skewed, Seq("k"))
      .select("bucket", "min_group_size", "n_keys", "n_rows")
      .as[(Int, Long, Long, Long)].collect().toList
    // 64 = 2^6 must land in bucket 6, not 5 (the floor(log2) double trap);
    // 8 = 2^3 in bucket 3; three singletons in bucket 0.
    assert(h === List((0, 1L, 3L, 3L), (3, 8L, 1L, 8L), (6, 64L, 1L, 64L)))
  }
}
