package graft.pipeline

import org.apache.spark.sql.functions._

import graft.GraftSuite

/** k-anonymity report + suppression: hand-built classes, the
  * complementarity law (report ∪ survivors == everything), survivor
  * byte-identity, and the k monotonicity contract.
  */
class PrivacySpec extends GraftSuite {
  import spark.implicits._

  private val rows = Seq(
    // (segment, region) classes: ("a", 1) × 3, ("a", 2) × 2, ("b", 1) × 1
    (1L, "a", 1, "payload-1"),
    (2L, "a", 1, "payload-2"),
    (3L, "a", 1, "payload-3"),
    (4L, "a", 2, "payload-4"),
    (5L, "a", 2, "payload-5"),
    (6L, "b", 1, "payload-6"))
  private def df = rows.toDF("id", "seg", "reg", "payload")
  private val quasi = Seq("seg", "reg")

  test("report lists exactly the classes below k, with sizes") {
    val r3 = Privacy.kAnonymityReport(df, quasi, 3)
      .as[(String, Int, Long)].collect().toSet
    assert(r3 === Set(("a", 2, 2L), ("b", 1, 1L)))
    val r2 = Privacy.kAnonymityReport(df, quasi, 2)
      .as[(String, Int, Long)].collect().toSet
    assert(r2 === Set(("b", 1, 1L)))
  }

  test("suppression keeps only >= k classes; survivors byte-identical; report and survivors partition the input") {
    val kept = Privacy.suppressRare(df, quasi, 3)
      .select("id", "seg", "reg", "payload")
      .as[(Long, String, Int, String)].collect().toSet
    assert(kept === rows.filter(r => r._2 == "a" && r._3 == 1).toSet)
    // Complementarity: suppressed ids == ids of classes the report flags.
    val riskyClasses = Privacy.kAnonymityReport(df, quasi, 3)
      .select("seg", "reg").as[(String, Int)].collect().toSet
    val suppressed = rows.filterNot(r => kept.contains(r))
    assert(suppressed.map(r => (r._2, r._3)).toSet === riskyClasses)
    assert(kept.size + suppressed.size === rows.size)
  }

  test("k is monotone: raising k never re-admits a row; k covering the largest class empties the output") {
    val k3 = Privacy.suppressRare(df, quasi, 3).select("id").as[Long].collect().toSet
    val k2 = Privacy.suppressRare(df, quasi, 2).select("id").as[Long].collect().toSet
    assert(k3.subsetOf(k2))
    assert(Privacy.suppressRare(df, quasi, 4).isEmpty)
  }

  test("corpus-scale law at sf0.01: every surviving class has >= k members and no report class survives") {
    val c = spark.read.parquet(s"${graft.SparkTestBase.sf001}/customer.parquet")
    val q = Seq("c_mktsegment", "c_nationkey")
    val kept = Privacy.suppressRare(c, q, 10)
    val minClass = kept.groupBy(q.map(col): _*).count()
      .agg(min("count")).first().getLong(0)
    assert(minClass >= 10L)
    val overlap = Privacy.kAnonymityReport(c, q, 10)
      .join(kept, q, "left_semi").count()
    assert(overlap === 0L)
  }
}
