package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column handling: treat image/audio/video payloads as opaque
  * `binary` columns plus a typed metadata struct, exactly as a 100 TB
  * training-data lake stores them. The Spark-side plumbing — schema,
  * partition-parallel batch decode, deterministic feature extraction — is
  * real and tested; the actual media decode is STUBBED (this container has
  * no image/audio codecs) behind [[decodeStub]], a deterministic fake that
  * any real decoder (JNI, subprocess, vectorized UDF) would replace with
  * the same signature.
  */
object Multimodal {

  /** Metadata schema carried alongside every binary payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("digest", StringType, nullable = false)))

  /** Wrap a text column as an opaque binary payload with typed metadata —
    * the ingest step. (On a real lake the binary comes off object storage;
    * here we synthesize it from `documents.text` so the plumbing is
    * exercised end-to-end on driver fixtures.) Pure projection: codegen'd,
    * no shuffle.
    */
  def ingestBinary(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bin = encode(col(textCol), "UTF-8")
    docs.select(
      col(idCol),
      bin.as("payload"),
      struct(
        lit("text/plain").as("media_type"),
        octet_length(bin).cast("long").as("n_bytes"),
        sha2(bin, 256).as("digest")).as("meta"))
  }

  /** Deterministic fake "decode" of a binary payload into media features
    * (dimensions, frame count). STUB: a real pipeline swaps the arithmetic
    * for an actual codec call; everything around it — the schema, the
    * column-level contract, the scale shape (map-only, no shuffle) — is the
    * real design.
    */
  def decodeStub(df: DataFrame): DataFrame = {
    val n = col("meta.n_bytes")
    df
      .withColumn("width", (lit(32) + pmod(n, lit(608))).cast("int"))
      .withColumn("height", (lit(32) + pmod(n * 7, lit(608))).cast("int"))
      .withColumn("n_frames", (lit(1) + pmod(n, lit(16))).cast("int"))
  }

  /** Uniform frame sampling over decoded video metadata: emit at most
    * `maxSamples` evenly-strided frame indices per asset, each with the
    * byte offset a raw-RGB frame store would seek to (offset arithmetic is
    * part of the stub contract; a real container format replaces it with
    * its own index lookup). The step is `ceil(n_frames / maxSamples)`
    * computed in integer arithmetic, so every engine derives the identical
    * sample set.
    *
    * Scale shape: map-only `sequence` + `explode`, fan-out ≤ maxSamples
    * per asset — no shuffle; the downstream per-frame decode inherits the
    * corpus partitioning.
    */
  def sampleFrames(decoded: DataFrame, idCol: String, maxSamples: Int): DataFrame = {
    require(maxSamples >= 1, s"maxSamples must be >= 1, got $maxSamples")
    val step = floor((col("n_frames") + (maxSamples - 1)) / maxSamples).cast("int")
    decoded
      .select(col(idCol), col("width"), col("height"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, step)).as("frame_idx"))
      .select(
        col(idCol),
        col("n_frames"),
        col("frame_idx"),
        (col("frame_idx").cast("long") * col("width") * col("height") * 3L)
          .as("byte_offset"))
  }

  /** Resize planning over decoded dimensions: fit each asset inside
    * `maxSide` × `maxSide` preserving aspect ratio, never upscaling —
    * the deterministic geometry a vision-model preprocessor needs
    * computed corpus-side so the (expensive, stubbed) pixel resample can
    * be batched by output shape. Integer arithmetic only
    * (`out = max(1, dim * maxSide / longest)`, truncating division), so
    * every engine plans the identical geometry. Map-only projection.
    *
    * @return input columns + (`out_w`, `out_h`, `resized`: whether the
    *         plan shrinks the asset).
    */
  def resizePlan(decoded: DataFrame, maxSide: Int): DataFrame = {
    require(maxSide >= 1, s"maxSide must be >= 1, got $maxSide")
    val longest = greatest(col("width"), col("height"))
    val shrink = longest > maxSide
    def scaled(dim: org.apache.spark.sql.Column) =
      greatest(lit(1), floor(dim.cast("long") * maxSide / longest).cast("int"))
    decoded
      .withColumn("out_w", when(shrink, scaled(col("width"))).otherwise(col("width")))
      .withColumn("out_h", when(shrink, scaled(col("height"))).otherwise(col("height")))
      .withColumn("resized", shrink)
  }

  /** Deterministic fake audio "decode": sample rate off a 3-value table,
    * duration proportional to payload size (200 ms – 60 s). STUB with the
    * same contract as [[decodeStub]] — a real pipeline swaps in a codec
    * probe; schema, determinism, and the map-only shape are the design.
    */
  def decodeAudioStub(df: DataFrame): DataFrame = {
    val n = col("meta.n_bytes")
    df
      .withColumn("sample_rate",
        element_at(array(lit(16000), lit(22050), lit(44100)), (pmod(n, lit(3)) + 1).cast("int")))
      .withColumn("duration_ms", (lit(200) + pmod(n * 31, lit(59801))).cast("long"))
  }

  /** Audio segment planning — the temporal half of feature extraction
    * computed corpus-side (the [[resizePlan]] discipline applied to time):
    * fixed `windowMs` windows every `hopMs` per asset, the final window
    * truncated at the asset's end, plus the sample offsets a PCM featurizer
    * seeks to ((ms × rate) / 1000 in truncating integer arithmetic, so
    * every engine plans the identical segment set). Map-only `sequence` +
    * `explode`; fan-out = ceil(duration / hop) per asset; the stubbed
    * feature computation batches by (sample_rate, window) shape.
    */
  def segmentPlan(decoded: DataFrame, windowMs: Int, hopMs: Int): DataFrame = {
    require(windowMs >= 1, s"windowMs must be >= 1, got $windowMs")
    require(hopMs >= 1, s"hopMs must be >= 1, got $hopMs")
    val nSegs = ((col("duration_ms") - 1) / hopMs).cast("long") + 1
    // `div` (IntegralDivide), not `/`: Spark's / on integral operands is
    // DOUBLE division, whose floor only coincides with the truncating
    // integer arithmetic the contract (and the DuckDB // oracle) promises
    // while ms × rate stays within double precision. div holds for any
    // duration/rate.
    def toSamples(ms: String) = expr(s"($ms * sample_rate) div 1000").cast("long")
    decoded
      .withColumn("seg_idx", explode(sequence(lit(0L), nSegs - 1)))
      .withColumn("start_ms", col("seg_idx") * hopMs)
      .withColumn("end_ms", least(col("start_ms") + windowMs, col("duration_ms")))
      .withColumn("start_sample", toSamples("start_ms"))
      .withColumn("end_sample", toSamples("end_ms"))
  }

  /** Batch feature extraction via `mapPartitions` — the escape hatch for
    * per-row imperative decode logic that cannot be an expression (e.g. a
    * native codec handle reused across a partition). Opens one "decoder"
    * per partition, not per row — the shape that matters at scale. The
    * decode itself is the same deterministic stub.
    */
  def batchDecode(df: DataFrame): DataFrame = {
    val schema = StructType(df.schema.fields ++ Array(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("n_frames", IntegerType)))
    val metaIdx = df.schema.fieldIndex("meta")
    val rdd = df.rdd.mapPartitions { rows =>
      // STUB: a real implementation initializes the codec once here.
      rows.map { r =>
        val nBytes = r.getStruct(metaIdx).getAs[Long]("n_bytes")
        Row.fromSeq(r.toSeq ++ Seq(
          (32 + nBytes % 608).toInt, (32 + (nBytes * 7) % 608).toInt, (1 + nBytes % 16).toInt))
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
