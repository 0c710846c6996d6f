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

  test("at-rest store: backfill + partition-scoped appends answer exactly; re-ingest replaces, untouched buckets stay physically untouched") {
    val ev = events(SparkTestBase.sf0001)
    val store = s"${java.nio.file.Files.createTempDirectory("hllstore")}/sk"
    def slices(pred: org.apache.spark.sql.Column) =
      Sketches.distinctSketches(ev.filter(pred), Seq("event_type", "day"), "user_id")
    val days = ev.select("day").distinct().orderBy("day").collect().map(_.getDate(0))
    assert(days.length >= 3, "fixture needs ≥3 days")
    val (backfill, tail) = days.splitAt(days.length - 2)
    Sketches.writeSketchStore(
      slices(col("day") <= lit(backfill.last)), store, Seq("event_type", "day"))
    for (d <- tail) Sketches.appendSlices(spark, store, slices(col("day") === lit(d)))

    // The persisted few-KB rows answer the whole corpus exactly.
    val exact = ev.groupBy("event_type").agg(count_distinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(Sketches.storedEstimate(spark, store, Seq("event_type"))
      .as[(String, Long)].collect().toMap === exact)

    // Re-ingesting an already-stored day: its rows REPLACE (no
    // double-count, no row growth), and buckets its keys don't hash to
    // are physically untouched files.
    def fileState() = {
      val root = new java.io.File(store)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(root).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> (f.lastModified(), f.length())).toMap
    }
    val spec = graft.merge.PartitionedTarget.readSpec(spark, store)
    val redo = slices(col("day") === lit(backfill.last))
    val touched = redo
      .select(spec.bucket(Seq(col("event_type"), col("day"))).as("b"))
      .distinct().as[Int].collect().toSet
    val before = fileState()
    val rowsBefore = graft.merge.PartitionedTarget.read(spark, store).count()
    Sketches.appendSlices(spark, store, redo)
    val after = fileState()
    assert(graft.merge.PartitionedTarget.read(spark, store).count() === rowsBefore)
    assert(Sketches.storedEstimate(spark, store, Seq("event_type"))
      .as[(String, Long)].collect().toMap === exact)
    val untouchedBefore = before.filterNot { case (p, _) =>
      touched.exists(b => p.contains(s"__graft_bucket=$b/")) }
    assert(untouchedBefore.nonEmpty, "fixture should leave some bucket untouched")
    for ((p, st) <- untouchedBefore)
      assert(after.get(p).contains(st), s"untouched bucket file changed: $p")

    // Slices regroup from the store without the slice key: per-day rows
    // collapse to per-type — already asserted — and to daily totals.
    val perDay = Sketches.storedEstimate(spark, store, Seq("day"))
      .as[(java.sql.Date, Long)].collect().toMap
    val exactDay = ev.groupBy("day").agg(count_distinct(col("user_id")).as("n"))
      .as[(java.sql.Date, Long)].collect().toMap
    assert(perDay === exactDay)
  }
}
