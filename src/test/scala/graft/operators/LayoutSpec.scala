package graft.operators

import java.nio.file.Files

import graft.{GraftSuite, SparkTestBase}

/** Output sizing: partition count scales with the size estimate and the
  * written directory honors it.
  */
class LayoutSpec extends GraftSuite {

  private lazy val lineitem = spark.read.parquet(s"${SparkTestBase.sf0001}/lineitem.parquet")

  test("partitionsFor scales inversely with the target size") {
    val small = Layout.partitionsFor(lineitem, 64 * 1024)
    val big = Layout.partitionsFor(lineitem, 10L << 30)
    assert(big === 1)
    assert(small > big)
  }

  test("writeSized produces the computed number of parquet files") {
    val dir = Files.createTempDirectory("layout").resolve("out").toString
    val parts = Layout.partitionsFor(lineitem, 256 * 1024)
    Layout.writeSized(lineitem, dir, 256 * 1024)
    val files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files === parts)
    assert(spark.read.parquet(dir).count() === lineitem.count())
  }
}
