package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSuite

/** Streaming-extension specs: micro-batch upsert convergence and the
  * watermarked window aggregation.
  */
class StreamingUpsertSpec extends GraftSuite {
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("foreachBatch upsert converges to the batch-merge result across micro-batches") {
    val dir = Files.createTempDirectory("stream-upsert")
    val target = dir.resolve("t").toString
    Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "ver").write.parquet(target)

    val mem = MemoryStream[(Long, String, Long)]
    val q = StreamingUpsert.upsertTo(
      mem.toDF().toDF("k", "v", "ver"), target, Seq("k"),
      dir.resolve("cp").toString, orderCol = Some("ver"))
    try {
      mem.addData((2L, "B", 2L), (3L, "c", 2L))
      q.processAllAvailable()
      // mid-stream state: update + insert applied, nothing deleted
      assert(spark.read.parquet(target).count() === 3)

      // second batch: late duplicate for k=3 loses to ver=3 (last-write-wins)
      mem.addData((3L, "C", 3L), (3L, "c-old", 1L), (4L, "d", 3L))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(target).as[(Long, String, Long)].collect().toSet
    assert(got === Set((1L, "a", 1L), (2L, "B", 2L), (3L, "C", 3L), (4L, "d", 3L)))
  }

  test("replayed batch is idempotent: re-merging the same rows is all no-op") {
    val dir = Files.createTempDirectory("stream-replay")
    val target = dir.resolve("t").toString
    Seq((1L, "a", 1L)).toDF("k", "v", "ver").write.parquet(target)
    val batch = Seq((1L, "a2", 2L), (2L, "b", 2L)).toDF("k", "v", "ver")
    val r1 = graft.merge.MergeApply.applyTo(spark, target, batch,
      graft.merge.MergeOptions(keys = Seq("k"), delete = graft.merge.DeleteMode.Ignore))
    val r2 = graft.merge.MergeApply.applyTo(spark, target, batch,
      graft.merge.MergeOptions(keys = Seq("k"), delete = graft.merge.DeleteMode.Ignore))
    assert(r1.affectedRows === 2L && r2.affectedRows === 0L)
  }

  test("replaying the events table in 2 batches converges to the batch merge") {
    val dir = Files.createTempDirectory("stream-events")
    val target = dir.resolve("t").toString
    // Key on event_id; value columns only (nanos ts column dropped — the
    // replay exercises upsert convergence, not timestamp plumbing).
    val ev = graft.queries.Fixtures.events(spark, graft.SparkTestBase.sf0001)
      .select($"event_id", $"user_id", $"event_type", $"value")
    // Seed the target with half the events, values perturbed (stale state).
    ev.filter($"event_id" % 2 === 0).withColumn("value", $"value" + 1.0)
      .write.parquet(target)

    val rows = ev.as[(Long, Long, String, Double)].collect().toSeq
    val (batch1, batch2) = rows.partition(_._1 < 500)
    val mem = MemoryStream[(Long, Long, String, Double)]
    val q = StreamingUpsert.upsertTo(
      mem.toDF().toDF("event_id", "user_id", "event_type", "value"),
      target, Seq("event_id"), dir.resolve("cp").toString)
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()

    // Converged state == the events table itself (every stale value
    // overwritten, every missing event inserted).
    val got = spark.read.parquet(target).as[(Long, Long, String, Double)].collect().toSet
    assert(got === rows.toSet)
  }

  test("stale event in a LATER batch never overwrites fresher target data") {
    val dir = Files.createTempDirectory("stream-stale")
    val target = dir.resolve("t").toString
    Seq((1L, "seed", 0L)).toDF("k", "v", "ver").write.parquet(target)
    val mem = MemoryStream[(Long, String, Long)]
    val q = StreamingUpsert.upsertTo(
      mem.toDF().toDF("k", "v", "ver"), target, Seq("k"),
      dir.resolve("cp").toString, orderCol = Some("ver"))
    try {
      mem.addData((1L, "fresh", 5L))
      q.processAllAvailable()
      // Late out-of-order event for the same key with an OLDER version.
      mem.addData((1L, "stale", 3L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(target).as[(Long, String, Long)].collect().toSet
    assert(got === Set((1L, "fresh", 5L))) // stale batch was a no-op
  }

  test("watermarked hourly aggregation emits per-window counts") {
    val mem = MemoryStream[(Timestamp, String, Double)]
    val agg = StreamingUpsert.hourlyCounts(
      mem.toDF().toDF("ts", "event_type", "value"), "ts", "event_type", "value")
    val q = agg.writeStream.outputMode("update").format("memory").queryName("hc_test").start()
    try {
      mem.addData(
        (Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
        (Timestamp.valueOf("2024-01-01 10:45:00"), "click", 2.0),
        (Timestamp.valueOf("2024-01-01 11:05:00"), "view", 5.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("hc_test")
      .selectExpr("event_type", "n", "sum_value").as[(String, Long, Double)].collect().toSet
    assert(rows === Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
  }
}
