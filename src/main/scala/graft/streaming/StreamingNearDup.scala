package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.StreamingQuery

import graft.pipeline.Similarity

/** Streaming embedding near-dup-on-ingest: incoming vectors are checked
  * against a STATIC corpus via random-hyperplane LSH
  * ([[Similarity.hyperplaneLshPairs]]'s plane family) — the signature step
  * is a stateless map (the ±1 planes are data-independent constants, so
  * there is no centroid model to retrain and corpus signatures never go
  * stale), the candidate step is a stream-static equi-join on
  * (band, bucket), and verification is exact cosine. Streaming state is
  * ZERO: each micro-batch resolves entirely against the pre-staged corpus
  * frames, so a 1000-executor ingest job holds nothing in the state store
  * — the scale cost per batch is |batch| signatures + bucket-local joins.
  */
object StreamingNearDup {

  /** The pre-staged corpus side: occupancy-capped exploded signatures and
    * the norm payloads, both persisted ONCE at index build — every
    * micro-batch joins these instead of re-deriving the corpus lineage.
    */
  final class CorpusIndex private[StreamingNearDup] (
      private[graft] val sig: DataFrame,
      private[graft] val vecs: DataFrame,
      val dim: Int,
      val nBits: Int,
      val bandBits: Int,
      val seed: Int) {
    def release(): Unit = {
      sig.unpersist()
      vecs.unpersist()
    }
  }

  /** Stage the corpus for streaming ingest: norm projection + capped
    * band-bucket signatures, persisted. Same cap semantics as
    * [[Similarity.hyperplaneIncrementalPairsHandle]]: degenerate buckets
    * (mass-duplicated corpus vectors collide in every band) are dropped
    * whole so no micro-batch ever pays a quadratic bucket fan-out.
    */
  def indexCorpus(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      nBits: Int = 16,
      bandBits: Int = 8,
      seed: Int = 7,
      bucketCap: Int = 10000): CorpusIndex = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val vecs = Similarity.hyperplaneNorms(corpus, idCol, vecCol).persist(lvl)
    val sig = Similarity.signatureOf(vecs, dim, nBits, bandBits, seed)
      .withColumn("__occ", count(lit(1)).over(Window.partitionBy("band", "bucket")))
      .filter(col("__occ") <= bucketCap)
      .drop("__occ")
      .persist(lvl)
    new CorpusIndex(sig, vecs, dim, nBits, bandBits, seed)
  }

  /** One micro-batch's pairs: (new_id, corpus_id, sim >= threshold).
    * Candidate dedup (a batch vector colliding with the same corpus vector
    * in BOTH bands) happens WITHIN the batch — exact, and with zero
    * streaming state; across batches each incoming id arrives once by the
    * source's contract (pair rows are per-arrival facts, st2's
    * dedupedAppendTo is the tool when the source replays).
    */
  private[graft] def batchPairs(
      batch: DataFrame, idx: CorpusIndex, idCol: String, vecCol: String,
      threshold: Double): DataFrame =
    Similarity.incrementalPairsAgainst(
      Similarity.hyperplaneNorms(batch, idCol, vecCol),
      idx.sig, idx.vecs, idx.dim, threshold, idx.nBits, idx.bandBits, idx.seed)

  /** Start the ingest: every micro-batch of `newVecs` (streaming) is
    * signatured, joined against the staged corpus, cosine-verified, and
    * its pairs appended to `targetPath` as parquet. foreachBatch (the
    * [[StreamingUpsert.upsertTo]] discipline) so the within-batch
    * candidate `distinct` runs as a plain batch aggregation instead of
    * accreting streaming dedup state.
    */
  def ingestTo(
      newVecs: DataFrame,
      idx: CorpusIndex,
      idCol: String,
      vecCol: String,
      threshold: Double,
      targetPath: String,
      checkpointDir: String): StreamingQuery =
    newVecs.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batchPairs(batch, idx, idCol, vecCol, threshold)
          .write.mode("append").parquet(targetPath)
      }
      .start()

  /** Read the converged pair frame. */
  def readPairs(spark: SparkSession, targetPath: String): DataFrame =
    spark.read.parquet(targetPath)
}
