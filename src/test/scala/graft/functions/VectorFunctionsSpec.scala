package graft.functions

import org.apache.spark.sql.functions._

import graft.GraftSuite

/** Specs for the native DotProduct expression: parity with the HOF fold
  * (both evaluation modes), SQL availability via the extension.
  */
class VectorFunctionsSpec extends GraftSuite {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
    (2L, Array(0.1, -0.2, 0.3), Array(-0.4, 0.5, -0.6)),
    (3L, Array.empty[Double], Array.empty[Double])
  ).toDF("id", "a", "b")

  test("matches the aggregate/zip_with fold bit-for-bit") {
    val hof = aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val rows = vecs
      .select($"id", graft.pipeline.Similarity.dot($"a", $"b").as("native"), hof.as("hof"))
      .as[(Long, Double, Double)].collect()
    rows.foreach { case (_, native, fold) => assert(native === fold) }
  }

  test("codegen and interpreted evaluation agree") {
    val native = graft.pipeline.Similarity.dot($"a", $"b")
    val withCodegen = vecs.select(native).as[Double].collect().toSeq
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = vecs.select(native).as[Double].collect().toSeq
      assert(withCodegen === interpreted)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("registered for SQL via GraftExtensions") {
    vecs.createOrReplaceTempView("vf_vecs")
    val r = spark.sql("SELECT graft_dot_product(a, b) AS d FROM vf_vecs WHERE id = 1")
      .as[Double].head()
    assert(r === 32.0)
  }

  test("float embeddings cast to double keep oracle-compatible values") {
    val f = Seq((1L, Array(0.5f, 0.25f))).toDF("id", "v")
    val d = f.select(graft.pipeline.Similarity.dot(
      $"v".cast("array<double>"), $"v".cast("array<double>"))).as[Double].head()
    assert(d === 0.3125)
  }
}
