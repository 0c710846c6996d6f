package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.pipeline.{Similarity, TextStats}

/** Continuous posting-index maintenance — the ingest-time twin of the
  * batch [[TextStats.writeBm25Index]]/[[TextStats.appendToBm25Index]]
  * pair: documents stream in, and every micro-batch lands in the at-rest
  * BM25 index as a crash-atomic append, so retrieval (t23/t25-style
  * probes) always sees the corpus as of the last completed batch — no
  * nightly rebuild, no full-corpus re-tokenize, ever.
  *
  * Exactly-once under foreachBatch replay (the [[StreamingUpsert]]
  * guarantee, by a different mechanism — an index append is NOT
  * idempotent the way a change-detected merge is):
  *
  *   - batch appends stage a stream-batch watermark WITH the postings
  *     and promote both under the same intent marker
  *     ([[TextStats.appendToBm25Index]]'s `streamBatchId`), so "did this
  *     batch land" is answerable after any crash;
  *   - a replayed batch id ≤ the promoted watermark is skipped;
  *   - an interrupted append rolls FORWARD first
  *     ([[TextStats.recoverBm25Index]] — staged data is complete by the
  *     marker's contract), after which the watermark decides;
  *   - the bootstrap (no watermark on disk yet) is a full
  *     [[TextStats.writeBm25Index]] in overwrite mode — replaying it
  *     overwrites the same content, idempotent by construction, and the
  *     watermark lands strictly after the build completes, so an
  *     index-without-watermark is always an interrupted bootstrap and
  *     rebuilds.
  *
  * Contract inherited from the batch append: a document id enters the
  * stream ONCE (re-ingesting a doc doubles its postings, not replaces
  * them) — run the stream through [[StreamingUpsert]]-style dedup or the
  * d25 bloom gate first if the feed can repeat ids.
  *
  * Scale shape: per batch, cost is one tokenize + aggregation of the
  * BATCH plus a terms-cache merge (vocabulary-sized, not corpus-sized);
  * postings append under their term-hash buckets only. Appends accrete
  * one file set per touched bucket — schedule
  * [[TextStats.compactBm25Index]] (the `compactEvery` hook below) the
  * same way the streaming upsert compacts its target.
  */
object StreamingIndex {

  /** Start continuous BM25 index maintenance of `stream` (a frame with
    * `idCol`/`textCol`) into the index at `path`.
    *
    * @param compactEvery with a positive value, run
    *                     [[TextStats.compactBm25Index]] after every
    *                     `compactEvery`-th batch (replays re-compact at
    *                     worst — layout-only, idempotent). 0 disables.
    */
  def bm25IndexTo(
      stream: DataFrame,
      path: String,
      checkpoint: String,
      idCol: String,
      textCol: String,
      nBuckets: Int = 64,
      compactEvery: Int = 0): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, path, idCol, textCol, nBuckets, compactEvery)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** One micro-batch of index maintenance (the foreachBatch body,
    * exposed so the replay/crash windows are unit-testable). */
  private[graft] def applyBatch(
      batch: DataFrame, batchId: Long, path: String,
      idCol: String, textCol: String, nBuckets: Int,
      compactEvery: Int = 0): Unit =
    if (!batch.isEmpty) {
      val spark = batch.sparkSession
      val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val hasCorpus = fs.exists(new Path(s"$path/corpus"))
      // Roll any interrupted append forward BEFORE reading the
      // watermark — the staged watermark promotes with it.
      if (hasCorpus) TextStats.recoverBm25Index(spark, path)
      TextStats.readBm25StreamBatch(spark, path) match {
        case None =>
          // Bootstrap (or interrupted bootstrap — rebuild is the
          // recovery): overwrite build, watermark strictly after.
          TextStats.writeBm25Index(batch, idCol, textCol, path, nBuckets)
          TextStats.writeBm25StreamBatch(fs, path, batchId)
        case Some(last) if batchId <= last => () // replayed, already landed
        case Some(_) =>
          TextStats.appendToBm25Index(spark, path, batch, idCol, textCol,
            streamBatchId = Some(batchId))
      }
      if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
        TextStats.compactBm25Index(spark, path)
      ()
    }

  /** Continuous IVFADC index maintenance — [[bm25IndexTo]]'s discipline
    * for the vector lake: embeddings stream in, every micro-batch lands
    * in the at-rest codes as a crash-atomic watermarked append
    * ([[Similarity.appendToPqIndex]]'s `streamBatchId`), and ANN probes
    * ([[Similarity.pqIndexTopK]]/[[Similarity.pqIndexTopKBatch]]) always
    * see the corpus as of the last completed batch.
    *
    * The coarse/fine model (centroids + codebooks) is FIXED at
    * bootstrap — the C96 contract: batch 0 builds the index with the
    * model passed here (trained upstream on a sample; re-train and
    * rebuild on drift), later batches assign + encode against the
    * STORED sidecars. Same exactly-once construction as the BM25 form:
    * bootstrap = overwrite build with the watermark strictly after
    * (index-without-watermark always rebuilds), appends promote the
    * watermark WITH the codes, replayed ids ≤ the watermark skip,
    * interrupted appends roll forward first. Id-disjoint batches
    * required (the append contract).
    */
  def pqIndexTo(
      stream: DataFrame,
      path: String,
      checkpoint: String,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      codebooks: Seq[Seq[Seq[Double]]],
      compactEvery: Int = 0): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyPqBatch(batch, batchId, path, idCol, vecCol, centroids, codebooks, compactEvery)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** One micro-batch of IVFADC index maintenance (the foreachBatch
    * body, exposed so the replay/crash windows are unit-testable). */
  private[graft] def applyPqBatch(
      batch: DataFrame, batchId: Long, path: String,
      idCol: String, vecCol: String,
      centroids: DataFrame, codebooks: Seq[Seq[Seq[Double]]],
      compactEvery: Int = 0): Unit =
    if (!batch.isEmpty) {
      val spark = batch.sparkSession
      val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(new Path(s"$path/codebooks")))
        Similarity.recoverPqIndex(spark, path)
      Similarity.readPqStreamBatch(spark, path) match {
        case None =>
          Similarity.writePqIndex(batch, centroids, idCol, vecCol, codebooks, path)
          Similarity.writePqStreamBatch(fs, path, batchId)
        case Some(last) if batchId <= last => () // replayed, already landed
        case Some(_) =>
          Similarity.appendToPqIndex(batch, idCol, vecCol, path,
            streamBatchId = Some(batchId))
      }
      if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
        Similarity.compactPqIndex(spark, path)
      ()
    }
}
