package graft.operators

import org.apache.spark.sql.functions._
import graft.GraftSuite

/** Edit-distance fuzzy join: exact equivalence with the brute-force
  * levenshtein filter (the recall theorem), distance bounds, cap shadow.
  */
class FuzzyJoinSpec extends GraftSuite {
  import spark.implicits._

  private lazy val names = Seq(
    (1L, "kitten"), (2L, "sitten"), (3L, "sittin"), (4L, "kitchen"),
    (5L, "zebra"), (6L, "kitten"), (7L, "a"), (8L, "")
  ).toDF("id", "name")

  private def brute(maxDist: Int): Set[(Long, Long, Long)] = {
    val a = names.select(col("id").as("id_a"), col("name").as("n_a"))
    val b = names.select(col("id").as("id_b"), col("name").as("n_b"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("n_a"), col("n_b")).cast("long"))
      .where(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
  }

  test("d=1 pairs equal the brute-force filter: neighbors, exact copies, empty-vs-single-char") {
    val got = FuzzyJoin.editDistancePairs(names, "id", "name", maxDist = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === brute(1))
    assert(got.contains((1L, 2L, 1L)))  // kitten ~ sitten
    assert(got.contains((1L, 6L, 0L)))  // exact copy pairs at distance 0
    assert(got.contains((7L, 8L, 1L)))  // "a" ~ "" via the empty variant
    assert(!got.exists { case (_, _, d) => d > 1 })
  }

  test("d=2 pairs equal the brute-force filter, including the two-substitution pair") {
    val got = FuzzyJoin.editDistancePairs(names, "id", "name", maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === brute(2))
    assert(got.contains((1L, 3L, 2L)))  // kitten ~ sittin: two substitutions
    assert(got.contains((1L, 4L, 2L)))  // kitten ~ kitchen: sub + insert
  }

  test("incrementalPairs == full join restricted to delta-touching pairs, corpus never self-pairs") {
    val corpus = names.where(col("id") <= 5L)
    val delta = names.where(col("id") > 5L)
    val got = FuzzyJoin.incrementalPairs(corpus, delta, "id", "name", maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    val deltaIds = Set(6L, 7L, 8L)
    val expected = brute(2).filter { case (a, b, _) => deltaIds(a) || deltaIds(b) }
    assert(got === expected)
    // kitten(1) ~ kitten(6) crosses the boundary at distance 0; the
    // corpus-internal kitten~sitten pair must NOT surface.
    assert(got.contains((1L, 6L, 0L)))
    assert(!got.contains((1L, 2L, 1L)))
    // delta-internal pair: "a"(7) ~ ""(8) at distance 1.
    assert(got.contains((7L, 8L, 1L)))
  }

  test("bucketCap skips hub variants and the diag frame reports exactly those") {
    // 5 strings sharing the hub variant "xx" (each is "xx" + one distinct
    // char, so deleting that char lands every one of them in the same
    // bucket); one distant string pairs with nothing.
    val hub = (1L to 5L).map(i => (i, s"xx${('a' + i.toInt).toChar}")).toDF("id", "name")
      .unionByName(Seq((9L, "qqqq")).toDF("id", "name"))
    val (pairs, hot) = FuzzyJoin.editDistancePairsDiag(hub, "id", "name", maxDist = 1, bucketCap = 4)
    // Every hub pair shares ONLY the over-cap variant "xx" (occ=5) — with
    // the cap at 4 the pairs vanish and the shadow frame names the bucket.
    val hotRows = hot.as[(String, Long)].collect().toMap
    assert(hotRows.contains("xx") && hotRows("xx") === 5L)
    assert(pairs.count() === 0L)
    // Raising the cap restores the exact answer: C(5,2) last-char
    // substitution pairs, all at distance 1.
    val full = FuzzyJoin.editDistancePairs(hub, "id", "name", maxDist = 1, bucketCap = 100)
    assert(full.count() === 10L)
  }

  test("hub-set fallback: above hubBroadcastLimit the anti-join degrades to shuffle, same answer") {
    // Degenerate all-hub corpus: every variant bucket of the shared-stem
    // strings is over the cap, so the hot set itself is large relative to
    // a tiny hubBroadcastLimit — the fallback must keep the result
    // identical to the broadcast path, never OOM-by-broadcast.
    val hub = (1L to 6L).map(i => (i, s"xx${('a' + i.toInt).toChar}")).toDF("id", "name")
    def run(limit: Int) =
      FuzzyJoin.editDistancePairs(hub, "id", "name", maxDist = 1, bucketCap = 2,
        hubBroadcastLimit = limit).as[(Long, Long, Long)].collect().toSet
    val viaBroadcast = run(FuzzyJoin.DefaultHubBroadcastLimit)
    val viaShuffle = run(0)
    assert(viaBroadcast === viaShuffle)
    // And with no cap pressure both limits give the brute answer.
    def runFull(limit: Int) =
      FuzzyJoin.editDistancePairs(hub, "id", "name", maxDist = 1, bucketCap = 100,
        hubBroadcastLimit = limit).as[(Long, Long, Long)].collect().toSet
    assert(runFull(0) === runFull(FuzzyJoin.DefaultHubBroadcastLimit))
    assert(runFull(0).size === 15) // C(6,2) last-char substitution pairs
    // Incremental form honors the limit too.
    val inc0 = FuzzyJoin.incrementalPairs(
      hub.where(col("id") <= 3L), hub.where(col("id") > 3L), "id", "name",
      maxDist = 1, bucketCap = 100, hubBroadcastLimit = 0)
      .as[(Long, Long, Long)].collect().toSet
    val incBig = FuzzyJoin.incrementalPairs(
      hub.where(col("id") <= 3L), hub.where(col("id") > 3L), "id", "name",
      maxDist = 1, bucketCap = 100)
      .as[(Long, Long, Long)].collect().toSet
    assert(inc0 === incBig)
  }
}
