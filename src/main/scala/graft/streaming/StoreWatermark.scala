package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** O(1) batch-id watermark for the streaming count/n-gram store
  * maintainers — the r19 finding's fix: every maintainer used to read
  * `max(batch_id)` over the FULL store per micro-batch to decide
  * replay-vs-apply, the single step of an otherwise batch-bounded loop
  * whose cost grew with accumulated history. The watermark now lives in
  * marker FILES in the store root (`_graft_watermark_v&lt;n&gt;` —
  * underscore-prefixed, so Spark's partition discovery ignores them,
  * like the partition-spec sidecar), and the steady-state read is one
  * directory listing: no store data file is ever opened (spec-pinned —
  * [[landed]]'s doubt-resolution thunk is by-name and a steady-state
  * read must not force it).
  *
  * Exactly-once is preserved by an INTENT marker, the same roll-forward
  * /roll-back discipline as [[graft.merge.MergeApply]]'s swap markers:
  *
  *   1. [[begin]] creates `_graft_watermark_intent_v&lt;n&gt;` BEFORE
  *      the partition-scoped apply — "batch n may be partially applied
  *      from here on";
  *   2. the apply itself is all-or-nothing under its own swap protocol
  *      ([[graft.merge.MergeApply.recover]] rolls an interrupted swap
  *      back to the pre-batch store);
  *   3. [[commit]] creates the committed marker, then removes the
  *      intent and any older committed markers.
  *
  * A crash ANYWHERE in that window leaves the intent on disk, and the
  * next [[landed]] read resolves the doubt with ONE `max(batch_id)`
  * scan of the store — whatever the interrupted apply's outcome was
  * (rolled back: the scan reports the previous batch and the batch
  * re-applies; committed-but-unmarked: the scan reports the batch and
  * the replay skips) — then re-commits the answer so the NEXT read is
  * marker-only again. The full scan is therefore a crash-recovery
  * cost, paid at most once per interruption, never per micro-batch.
  * Stores written before this sidecar existed (no markers at all) take
  * the same one-scan reconciliation on first touch and are marker-only
  * thereafter.
  *
  * Single writer per store assumed, exactly like the maintainers that
  * call this (foreachBatch bodies run serially per query).
  */
object StoreWatermark {

  private val CommittedRe = "_graft_watermark_v([0-9]+)".r
  private val IntentRe = "_graft_watermark_intent_v([0-9]+)".r

  private def fsOf(spark: SparkSession, dir: Path) =
    dir.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Atomic create; an already-existing marker is the no-op outcome
    * (a replayed [[begin]] of the same interrupted batch, or a lost
    * create race) — the same posture as
    * [[graft.pipeline.ModelStore.publishVersion]].
    */
  private def createMarker(fs: org.apache.hadoop.fs.FileSystem, p: Path): Unit =
    try fs.create(p, false).close()
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => ()
      case _: java.nio.file.FileAlreadyExistsException => ()
      case _: java.io.IOException if fs.exists(p) => ()
    }

  /** The highest batch id whose apply COMMITTED — the replay-vs-apply
    * decision input, or -1 when nothing has landed. Steady state (a
    * committed marker present, no intent) answers from the directory
    * listing alone; `scanMax` — the caller's one full `max(batch_id)`
    * read of the store — is forced ONLY to resolve doubt (an intent
    * marker left by an interrupted apply, or a store with no markers
    * at all), and its answer is committed as a marker so the next read
    * is listing-only. Callers must run `MergeApply.recover` first, so
    * the store `scanMax` reads is never half-swapped.
    */
  def landed(spark: SparkSession, path: String, scanMax: => Long): Long = {
    val dir = new Path(path)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) return -1L
    val names = fs.listStatus(dir).map(_.getPath.getName)
    val committed = names.collect { case CommittedRe(v) => v.toLong }
    val intents = names.collect { case IntentRe(v) => v.toLong }
    if (intents.isEmpty && committed.nonEmpty) committed.max
    else {
      val m = scanMax
      if (m >= 0L) createMarker(fs, new Path(dir, s"_graft_watermark_v$m"))
      intents.foreach(v =>
        fs.delete(new Path(dir, s"_graft_watermark_intent_v$v"), false))
      committed.filter(_ < m).foreach(v =>
        fs.delete(new Path(dir, s"_graft_watermark_v$v"), false))
      m
    }
  }

  /** Declare intent to apply `batchId` — call strictly BEFORE the
    * partition-scoped apply. Idempotent (a crashed batch re-begins on
    * replay).
    */
  def begin(spark: SparkSession, path: String, batchId: Long): Unit = {
    require(batchId >= 0L, s"batchId must be >= 0, got $batchId")
    val dir = new Path(path)
    val fs = fsOf(spark, dir)
    fs.mkdirs(dir)
    createMarker(fs, new Path(dir, s"_graft_watermark_intent_v$batchId"))
  }

  /** Promote `batchId` as landed — call strictly AFTER the apply
    * returned. Commits the marker first (the point after which a
    * replay skips), then clears the intent and any older committed
    * markers, so the steady-state listing stays one or two entries
    * regardless of history.
    */
  def commit(spark: SparkSession, path: String, batchId: Long): Unit = {
    require(batchId >= 0L, s"batchId must be >= 0, got $batchId")
    val dir = new Path(path)
    val fs = fsOf(spark, dir)
    fs.mkdirs(dir)
    createMarker(fs, new Path(dir, s"_graft_watermark_v$batchId"))
    fs.delete(new Path(dir, s"_graft_watermark_intent_v$batchId"), false)
    fs.listStatus(dir).map(_.getPath.getName).foreach {
      case CommittedRe(v) if v.toLong < batchId =>
        fs.delete(new Path(dir, s"_graft_watermark_v$v"), false)
      case _ => ()
    }
  }
}
