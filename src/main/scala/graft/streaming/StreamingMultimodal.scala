package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.pipeline.Multimodal

/** Streaming multimodal ingest gate — the quarantine check a binary lake
  * runs AT THE DOOR, continuously: every arriving payload is typed from
  * its magic bytes ([[Multimodal.sniffMediaType]], a pure codegen'd
  * expression, so it runs unchanged on a streaming frame), and the
  * verdict routes the row — declared type confirmed by the bytes →
  * `accepted`, contradiction → `quarantine`, before any decoder ever
  * touches the payload.
  *
  * Scale shape: STATELESS — no state store rows, no watermark, map-only
  * per micro-batch; the exactly-once streaming file sink partitioned by
  * the verdict IS the routing (downstream decoders partition-prune to
  * `routed=accepted` and filter their container type; auditors read only
  * `routed=quarantine`). Per-batch cost scales with the batch.
  */
object StreamingMultimodal {

  /** The gate as a streaming-safe projection: sniff + verdict columns.
    * Works on any frame with the [[Multimodal.ingestBinary]] schema
    * (`payload` binary + `meta` struct), batch or streaming.
    */
  def sniffGate(stream: DataFrame): DataFrame =
    Multimodal.sniffMediaType(stream)
      .withColumn("routed",
        when(col("meta_agrees"), lit("accepted")).otherwise(lit("quarantine")))

  /** Run the gate into an exactly-once parquet sink partitioned by the
    * routing verdict. Returns the started query; callers own its
    * lifecycle.
    */
  def gateTo(stream: DataFrame, path: String, checkpoint: String): StreamingQuery =
    sniffGate(stream)
      .select(col("doc_id"), col("sniffed_type"),
        col("meta.media_type").as("declared"), col("routed"))
      .writeStream.outputMode("append").format("parquet")
      .partitionBy("routed")
      .option("path", path).option("checkpointLocation", checkpoint)
      .start()
}
