package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property oracles for the composed operators: the Spark result must
  * equal a driver-side brute-force evaluation on random small inputs.
  */
object OperatorProps extends Properties("operators") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withWorkers(1)

  private lazy val spark = graft.SparkTestBase.spark

  // ---- as-of join ----

  /** (key, ts, payload); (key, ts) pairs made unique so the expected
    * winner is unambiguous (duplicate right timestamps are documented as
    * caller-deduped).
    */
  private val asofGen: Gen[(Seq[(Long, Long, String)], Seq[(Long, Long, String)])] = for {
    l <- Gen.listOfN(15, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 40L), Gen.identifier.map(_.take(4))))
    r <- Gen.listOfN(15, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 40L), Gen.identifier.map(_.take(4))))
  } yield (l.distinctBy(x => (x._1, x._2)), r.distinctBy(x => (x._1, x._2)))

  property("backward as-of == brute-force latest-at-or-before per row") =
    forAll(asofGen) { case (lrows, rrows) =>
      val s = spark
      import s.implicits._
      val got = AsOfJoin.backward(
        lrows.toDF("k", "tts", "trade"), rrows.toDF("k", "qts", "quote"), Seq("k"), "tts", "qts")
        .select("k", "tts", "quote").as[(Long, Long, Option[String])].collect().toSet
      val expected = lrows.map { case (k, ts, _) =>
        val m = rrows.filter(r => r._1 == k && r._2 <= ts).sortBy(_._2).lastOption
        (k, ts, m.map(_._3))
      }.toSet
      got == expected
    }

  // ---- range join ----

  private val rangeGen: Gen[(Seq[(Long, Long)], Seq[(Long, Long, Long)], Long)] = for {
    pts <- Gen.listOfN(20, Gen.choose(0L, 100L)).map(_.distinct.zipWithIndex.map { case (p, i) => (i.toLong, p) })
    ivs <- Gen.listOfN(8, Gen.zip(Gen.choose(0L, 90L), Gen.choose(0L, 30L)))
      .map(_.zipWithIndex.map { case ((s0, len), i) => (i.toLong, s0, s0 + len) })
    w <- Gen.oneOf(1L, 7L, 16L, 1000L)
  } yield (pts, ivs, w)

  property("bin-bucketed range join == brute-force containment, any bin width") =
    forAll(rangeGen) { case (pts, ivs, w) =>
      val s = spark
      import s.implicits._
      val got = RangeJoin.pointInInterval(
        pts.toDF("p_id", "p"), ivs.toDF("i_id", "s", "e"), "p", "s", "e", w)
        .select("p_id", "i_id").as[(Long, Long)].collect()
      val expected = for {
        (pid, p) <- pts
        (iid, s0, e0) <- ivs
        if p >= s0 && p < e0
      } yield (pid, iid)
      got.sorted.toSeq == expected.sorted
    }

  // ---- fuzzy join ----

  private val fuzzyGen: Gen[(Seq[(Long, String)], Int)] = for {
    n <- Gen.chooseNum(2, 12)
    strs <- Gen.listOfN(n, Gen.chooseNum(0, 5).flatMap(l =>
      Gen.listOfN(l, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
    d <- Gen.oneOf(1, 2)
  } yield (strs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, d)

  property("edit-distance fuzzy join == brute-force levenshtein filter, d in {1,2}") =
    forAll(fuzzyGen) { case (rows, d) =>
      val s = spark
      import s.implicits._
      val got = FuzzyJoin.editDistancePairs(rows.toDF("id", "t"), "id", "t", maxDist = d)
        .as[(Long, Long, Long)].collect().toSet
      def lev(a: String, b: String): Int = {
        val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j => i.max(j)))
        for (i <- 1 to a.length; j <- 1 to b.length)
          dp(i)(j) = math.min(math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1,
            dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        dp(a.length)(b.length)
      }
      val expected = (for {
        (ia, ta) <- rows; (ib, tb) <- rows
        if ia < ib
        dist = lev(ta, tb)
        if dist <= d
      } yield (ia, ib, dist.toLong)).toSet
      got == expected
    }
}
