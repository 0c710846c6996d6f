package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

import graft.merge.{ChangeFeed, DeleteMode, MergeApply, MergeOptions, PartitionedTarget}

/** Continuous CDC apply — the streaming form of [[ChangeFeed]]: a
  * Debezium-shaped I/U/D log consumed micro-batch by micro-batch into a
  * parquet-backed target. `foreachBatch` + the batch CDC engine, the same
  * pattern as [[StreamingUpsert]] — except the feed is TRUSTED (no change
  * detection, no not-matched-by-source handling) and `D` rows REMOVE
  * keys, which the upsert path cannot express (its delete=Ignore contract
  * exists because a snapshot micro-batch is a partial view; a log op is
  * not a view, it IS the instruction).
  *
  * Per micro-batch: collapse the batch's multi-op log to its latest op
  * per key (window on `seqCol` — the log's order, with a content-hash
  * tiebreak so replays pick the same winner), then
  * [[ChangeFeed.applyToPartitioned]] against a [[PartitionedTarget]] —
  * read, rewrite, and swap prune to the buckets the batch's keys hash
  * into, so a micro-batch costs O(|batch|), not O(|target|). A plain
  * parquet directory takes the full-rewrite path (desired state computed
  * by [[ChangeFeed.apply]], applied as a delete-mode snapshot merge).
  *
  * At-least-once replay is idempotent: the apply is a deterministic
  * function f(state, batch) with f(f(s,b),b) = f(s,b) — re-deleting an
  * absent key is a no-op and re-upserting rewrites identical rows.
  *
  * Cross-batch ordering is the STREAM's contract (a CDC log is ordered;
  * batches apply in order); `seqCol` only arbitrates WITHIN a batch.
  */
object StreamingCdc {

  /** Start the continuous CDC apply of `feed` into the target. */
  def applyTo(
      feed: DataFrame,
      targetPath: String,
      keys: Seq[String],
      checkpoint: String,
      opCol: String = "op",
      seqCol: Option[String] = None): StreamingQuery =
    writer(feed, targetPath, keys, opCol, seqCol)
      .option("checkpointLocation", checkpoint)
      .start()

  /** The configured writer (exposed so harnesses can set a trigger). */
  def writer(
      feed: DataFrame,
      targetPath: String,
      keys: Seq[String],
      opCol: String = "op",
      seqCol: Option[String] = None): DataStreamWriter[Row] =
    feed.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val collapsed = latestPerKey(batch, keys, opCol, seqCol)
          if (PartitionedTarget.isPartitioned(spark, targetPath))
            ChangeFeed.applyToPartitioned(spark, targetPath, collapsed, keys, opCol)
          else {
            // Plain directory: compute the desired post state and let the
            // snapshot engine's staged atomic swap land it. delete=Delete
            // is safe here precisely because the source IS the desired
            // state, not a partial view.
            val desired = ChangeFeed.apply(
              spark.read.parquet(targetPath), collapsed, keys, opCol)
            MergeApply.applyTo(spark, targetPath, desired,
              MergeOptions(keys = keys, delete = DeleteMode.Delete))
          }
          ()
        }
      }

  /** Collapse a multi-op micro-batch to one row per key — the log's
    * latest by `seqCol` (content-hash tiebreak for replay determinism;
    * without a seqCol the hash alone arbitrates, which is only safe when
    * a batch carries at most one op per key). */
  private[streaming] def latestPerKey(
      batch: DataFrame, keys: Seq[String], opCol: String, seqCol: Option[String]): DataFrame = {
    val ord = seqCol.map(col(_).desc).toSeq :+
      xxhash64(batch.columns.toIndexedSeq.map(col): _*).asc
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn" +: seqCol.toSeq: _*)
  }
}
