package graft.operators

import org.apache.spark.sql.functions._

import graft.{GraftSuite, SparkTestBase}

/** HLL distinct-count sketches: exact in the sparse regime at both
  * fixture SFs, mergeable across slices in any regrouping, and
  * persistable as plain binary parquet.
  */
class SketchesSpec extends GraftSuite {
  import spark.implicits._

  private def events(dir: String) =
    spark.read.parquet(s"$dir/events.parquet").withColumn("day", to_date(col("ts")))

  test("sketch union estimate == exact distinct at both fixture SFs (sparse-mode regime)") {
    for (dir <- Seq(SparkTestBase.sf0001, SparkTestBase.sf001)) {
      val ev = events(dir)
      val exact = ev.groupBy("event_type").agg(count_distinct(col("user_id")).as("n"))
        .as[(String, Long)].collect().toMap
      val est = Sketches.unionEstimate(
        Sketches.distinctSketches(ev, Seq("event_type", "day"), "user_id"),
        Seq("event_type"))
        .as[(String, Long)].collect().toMap
      assert(est === exact, dir)
    }
  }

  test("sketches regroup freely: day slices collapse to the whole-corpus answer; persisted round-trip") {
    val ev = events(SparkTestBase.sf001).withColumn("grp", lit("all"))
    val daily = Sketches.distinctSketches(ev, Seq("grp", "day"), "user_id")
    // More slices than days would fit one scan: union across ALL slices
    // equals the single-sketch answer over the raw rows.
    val direct = Sketches.unionEstimate(
      Sketches.distinctSketches(ev, Seq("grp"), "user_id"), Seq("grp"))
      .as[(String, Long)].collect().toMap
    val merged = Sketches.unionEstimate(daily, Seq("grp"))
      .as[(String, Long)].collect().toMap
    assert(merged === direct)
    // The increment persists as plain parquet binary and unions after a
    // round-trip — history itself is never needed again.
    val dir = java.nio.file.Files.createTempDirectory("hll").toString
    daily.write.parquet(s"$dir/sketches")
    val reread = Sketches.unionEstimate(
      spark.read.parquet(s"$dir/sketches"), Seq("grp"))
      .as[(String, Long)].collect().toMap
    assert(reread === direct)
  }
}
