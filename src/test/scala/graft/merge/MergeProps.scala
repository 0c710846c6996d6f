package graft.merge

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property families from SURVEY §5.3, over random small tables:
  * (a) merge(T,S,delete=YES) ≡ S on distinct keys (incl. NULL keys),
  * (b) idempotence — a second merge is all no-op,
  * (c) audit rows == affected count,
  * (d) badKey — result multiset ≡ source multiset under duplicate keys,
  * (e) NULL keys pair up (A7).
  */
object MergeProps extends Properties("SimpleMerge") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withWorkers(1)

  private lazy val spark = graft.SparkTestBase.spark

  type R = (Option[Long], String, Double)

  private val rowGen: Gen[R] = for {
    k <- Gen.frequency(9 -> Gen.choose(0L, 15L).map(Some(_)), 1 -> Gen.const(None))
    s <- Gen.oneOf("x", "y", "z")
    d <- Gen.choose(0, 99).map(_.toDouble)
  } yield (k, s, d)

  private def tableGen(distinctKeys: Boolean): Gen[Seq[R]] =
    Gen.listOfN(25, rowGen).map(rows => if (distinctKeys) rows.distinctBy(_._1) else rows)

  private def toDF(rows: Seq[R]) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "s", "d")
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[R] = {
    val s = spark
    import s.implicits._
    df.as[R].collect().toSeq
  }

  private def merge(t: Seq[R], src: Seq[R]) =
    SimpleMerge.into(toDF(t)).using(toDF(src)).keys("k")

  property("delete=YES on distinct keys: result set == source set") =
    forAll(tableGen(true), tableGen(true)) { (t, src) =>
      rowsOf(merge(t, src).delete("YES").merged).toSet == src.toSet
    }

  property("idempotence: re-merging the result is all no-op") =
    forAll(tableGen(true), tableGen(true)) { (t, src) =>
      val once = rowsOf(merge(t, src).delete("YES").merged)
      merge(once, src).delete("YES").affectedCount() == 0L
    }

  property("audit row count == affected count") =
    forAll(tableGen(true), tableGen(true)) { (t, src) =>
      val m = merge(t, src).delete("YES")
      m.audit.count() == m.affectedCount()
    }

  property("badKey: result multiset == source multiset under duplicate keys") =
    forAll(tableGen(false), tableGen(false)) { (t, src) =>
      val got = rowsOf(merge(t, src).badKey(true).delete("YES").merged)
      got.sortBy(_.toString) == src.sortBy(_.toString)
    }

  property("NULL keys pair up: the null-key row takes the source value (A7)") =
    forAll(Gen.oneOf("x", "y", "z"), Gen.choose(0, 99)) { (s0, d0) =>
      val t = Seq((None: Option[Long], "old", 0.0), (Some(1L), "a", 1.0))
      val src = Seq((None: Option[Long], s0, d0.toDouble), (Some(1L), "a", 1.0))
      rowsOf(merge(t, src).delete("YES").merged).toSet == src.toSet
    }
}
