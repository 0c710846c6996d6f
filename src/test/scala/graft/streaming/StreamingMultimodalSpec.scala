package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.GraftSuite
import graft.pipeline.Multimodal

/** Streaming sniff-quarantine gate: routing correctness across
  * micro-batches, and the verdict-partitioned sink layout downstream
  * decoders partition-prune on.
  */
class StreamingMultimodalSpec extends GraftSuite {
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("sniff gate routes real containers to accepted and byte-liars to quarantine, per batch") {
    val scratch = Files.createTempDirectory("graft-st12-spec").toString
    val ids = Seq(1L, 2L).toDF("doc_id")
    // Batch 1: a real PNG and a text payload declared as PNG (a liar).
    val png = Multimodal.synthesizePngs(ids.filter($"doc_id" === 1L), "doc_id")
    val liar = Multimodal.ingestBinary(
        Seq((2L, "just text")).toDF("doc_id", "text"), "doc_id", "text")
      .withColumn("meta", struct(lit("image/png").as("media_type"),
        col("meta.n_bytes"), col("meta.digest")))
    // Batch 2: a real WAV, correctly declared.
    val wav = Multimodal.synthesizeWavs(ids.filter($"doc_id" === 2L), "doc_id")
      .withColumn("doc_id", lit(3L))
    def stage(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("payload"), col("meta.media_type"),
          col("meta.n_bytes"), col("meta.digest"))
        .as[(Long, Array[Byte], String, Long, String)].collect().toIndexedSeq
    val mem = MemoryStream[(Long, Array[Byte], String, Long, String)]
    val stream = mem.toDS().toDF("doc_id", "payload", "media_type", "n_bytes", "digest")
      .select(col("doc_id"), col("payload"),
        struct(col("media_type"), col("n_bytes"), col("digest")).as("meta"))
    val q = StreamingMultimodal.gateTo(stream, s"$scratch/out", s"$scratch/cp")
    try {
      mem.addData(stage(png.unionByName(liar)): _*); q.processAllAvailable()
      mem.addData(stage(wav): _*); q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(s"$scratch/out")
      .select("doc_id", "sniffed_type", "declared", "routed")
      .as[(Long, String, String, String)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, "image/png", "image/png", "accepted"),
      (2L, "application/octet-stream", "image/png", "quarantine"),
      (3L, "audio/wav", "audio/wav", "accepted")))
    // The verdict IS the sink layout: one directory per routing class.
    val dirs = new java.io.File(s"$scratch/out").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("routed=")).sorted.toSeq
    assert(dirs === Seq("routed=accepted", "routed=quarantine"))
  }
}
