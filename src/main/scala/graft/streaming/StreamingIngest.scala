package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.sources.Ingest

/** Streaming twin of [[graft.sources.Ingest]] — the continuous-crawl
  * shape: shards LAND over time (a `readStream` file source tails the
  * drop directory), and each micro-batch flows through the same
  * PERMISSIVE parse + quarantine routing as the batch reader. The gate
  * is STATELESS — pure per-row projection, no watermark, no state
  * store — so the converged sink equals the batch read of the same
  * shards (the st12 sniff-gate precedent), and per-batch cost is
  * O(batch) with no growth over stream lifetime.
  *
  * Routing uses ONE exactly-once file sink partitioned by verdict
  * (`routed=clean` / `routed=quarantine`) rather than two sinks: a
  * single streaming query means a single checkpoint — no torn state
  * where one sink committed a batch and the other did not. Clean rows
  * carry the typed columns; quarantine rows carry NULL typed columns
  * plus the raw line (nulled on clean rows — parquet NULLs are free,
  * so the corpus side doesn't pay double storage for bytes it never
  * reads). Consumers read `routed=clean` partition-pruned and never
  * touch quarantine bytes.
  */
object StreamingIngest {

  /** The gate as a streaming-safe projection over raw lines: typed
    * columns + `raw_line` (quarantine only) + `routed`. Works on any
    * frame with a string `lineCol`, batch or streaming.
    */
  def gate(lines: DataFrame, lineCol: String, schema: StructType): DataFrame = {
    val parsed = Ingest.parseJsonl(lines, lineCol, schema)
    val typed = schema.fieldNames.toSeq.map(f =>
      when(col("is_clean"), col(s"parsed.`$f`")).as(f))
    parsed.select(typed ++ Seq(
      when(!col("is_clean"), col(lineCol)).as("raw_line"),
      when(col("is_clean"), lit("clean")).otherwise(lit("quarantine"))
        .as("routed")): _*)
  }

  /** Run the JSONL quarantine gate into an exactly-once parquet sink
    * partitioned by the routing verdict. Returns the started query;
    * callers own its lifecycle.
    */
  def ingestTo(
      lines: DataFrame, lineCol: String, schema: StructType,
      path: String, checkpoint: String): StreamingQuery =
    gate(lines, lineCol, schema)
      .writeStream.outputMode("append").format("parquet")
      .partitionBy("routed")
      .option("path", path).option("checkpointLocation", checkpoint)
      .start()

  /** The WARC gate — [[graft.sources.Ingest.parseWarc]] (C198) as the
    * same stateless routing projection: clean records carry
    * (uri, http_status, body), rejects carry the raw record verbatim.
    * The record stream comes from a `readStream.text` tail of the drop
    * directory with the WARC version line as the record delimiter (the
    * same TextOptions the batch scan uses), so a continuously-landing
    * crawl flows through the identical parse — converged sink == batch
    * read, the C162 argument unchanged.
    */
  def warcGate(records: DataFrame, recCol: String): DataFrame = {
    val parsed = Ingest.parseWarc(records, recCol)
    parsed.select(
      when(col("is_clean"), col("uri")).as("uri"),
      when(col("is_clean"), col("http_status")).as("http_status"),
      when(col("is_clean"), col("body")).as("body"),
      when(!col("is_clean"), col(recCol)).as("raw_record"),
      when(col("is_clean"), lit("clean")).otherwise(lit("quarantine"))
        .as("routed"))
  }

  /** Run the WARC quarantine gate into the verdict-partitioned
    * exactly-once sink — [[ingestTo]]'s contract on the crawl
    * container.
    */
  def warcTo(
      records: DataFrame, recCol: String, path: String,
      checkpoint: String): StreamingQuery =
    warcGate(records, recCol)
      .writeStream.outputMode("append").format("parquet")
      .partitionBy("routed")
      .option("path", path).option("checkpointLocation", checkpoint)
      .start()
}
