package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.GraftSuite

/** Streaming-join specs: interval-join window bounds, cross-batch
  * matching, and watermark late-drop (the bounded-state contract);
  * stream-static enrichment per-batch semantics.
  */
class StreamingJoinSpec extends GraftSuite {
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val T0 = 1700000000000000L // µs
  private def mins(m: Long): Long = m * 60L * 1000000L

  /** Drive (click|view) tuples through the watermarked interval join in
    * explicit micro-batches; return the emitted (click_id, view_id) set.
    */
  private def run(batches: Seq[Seq[(Long, Long, Long, String)]]): Set[(Long, Long)] = {
    val scratch = Files.createTempDirectory("graft-sjoin").toString
    val mem = MemoryStream[(Long, Long, Long, String)]
    val ev = mem.toDF().toDF("event_id", "us", "user_id", "kind")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("kind"))
    val clicks = ev.filter(col("kind") === "c")
      .select(col("event_id").as("click_id"), col("user_id").as("cu"), col("ts").as("cts"))
      .withWatermark("cts", "60 minutes")
    val views = ev.filter(col("kind") === "v")
      .select(col("event_id").as("view_id"), col("user_id").as("vu"), col("ts").as("vts"))
      .withWatermark("vts", "60 minutes")
    val joined = StreamingJoin.intervalJoin(
      clicks, views, "cu", "vu", "cts", "vts", windowMinutes = 30)
      .select("click_id", "view_id")
    val q = joined.writeStream.outputMode("append").format("parquet")
      .option("path", s"$scratch/out").option("checkpointLocation", s"$scratch/cp")
      .start()
    try batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.read.parquet(s"$scratch/out").as[(Long, Long)].collect().toSet
  }

  test("interval join: in-window pairs emit, out-of-window and cross-user don't") {
    val out = run(Seq(Seq(
      (1L, T0, 7L, "v"),                 // view at t0
      (2L, T0 + mins(10), 7L, "c"),      // in window -> pair
      (3L, T0 + mins(31), 7L, "c"),      // past 30-min window -> no pair
      (4L, T0 - mins(1), 7L, "c"),       // click BEFORE view -> no pair
      (5L, T0 + mins(5), 8L, "c"))))     // other user -> no pair
    assert(out === Set((2L, 1L)))
  }

  test("interval join: cross-batch match within watermark emits") {
    val out = run(Seq(
      Seq((1L, T0, 7L, "v")),
      Seq((2L, T0 + mins(20), 7L, "c"))))
    assert(out === Set((2L, 1L)))
  }

  test("interval join: a click later than watermark+window never matches (state evicted)") {
    val out = run(Seq(
      Seq((1L, T0, 7L, "v")),
      // Push the watermark ~23 h past the view (far beyond 60 min delay
      // + 30 min window) with unrelated traffic ON BOTH BRANCHES — the
      // global watermark is the min over the inputs, so a branch that
      // has seen no data pins it at zero and nothing ever evicts.
      Seq((90L, T0 + mins(1400), 1L, "v"), (91L, T0 + mins(1400), 2L, "c")),
      Seq((92L, T0 + mins(1410), 1L, "v"), (93L, T0 + mins(1410), 2L, "c")),
      // ...then replay a "late" click that WOULD have been in-window.
      Seq((2L, T0 + mins(10), 7L, "c"))))
    assert(!out.contains((2L, 1L)),
      s"late click must not match an evicted view; got $out")
  }

  test("enrich: per-batch broadcast join, inner and left_outer modes") {
    val scratch = Files.createTempDirectory("graft-senrich").toString
    val dim = Seq((7L, "EU"), (8L, "NA")).toDF("uid", "region")
    val mem = MemoryStream[(Long, Long)]
    val enriched = StreamingJoin.enrich(
      mem.toDF().toDF("event_id", "user_id"), dim,
      Seq("user_id" -> "uid"), how = "left_outer")
      .select("event_id", "user_id", "region")
    val q = enriched.writeStream.outputMode("append").format("parquet")
      .option("path", s"$scratch/out").option("checkpointLocation", s"$scratch/cp")
      .start()
    try {
      mem.addData((1L, 7L), (2L, 9L)); q.processAllAvailable()
      mem.addData((3L, 8L)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(s"$scratch/out")
      .collect().map(r => (r.getLong(0), Option(r.getString(2)))).toSet
    assert(got === Set((1L, Some("EU")), (2L, None), (3L, Some("NA"))))
  }
}
