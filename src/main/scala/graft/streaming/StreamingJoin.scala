package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming joins — the two shapes a 100 TB ingest pipeline needs:
  *
  *   - [[enrich]]: stream-static enrichment. The dimension is a bounded
  *     frame joined into every micro-batch; `broadcast` pins the plan to
  *     a broadcast hash join so each batch pays a hash probe, never a
  *     shuffle of the stream side (the dimension re-broadcasts per batch
  *     — Spark's contract for picking up slowly-changing dims; cache the
  *     frame when it is truly static). No streaming state at all.
  *
  *   - [[intervalJoin]]: watermarked stream-stream event-time interval
  *     join (attribution: each left event matched to right events of the
  *     same key within `[rightTs, rightTs + window]`). Both sides MUST
  *     carry `withWatermark` — that bound is what lets Spark evict
  *     buffered rows once `watermark > ts + window`, keeping state
  *     proportional to the window × arrival rate instead of the stream's
  *     history. Choose watermark delay > window or in-window matches near
  *     batch boundaries can be dropped as late.
  */
object StreamingJoin {

  /** Enrich a (possibly streaming) frame with a small static dimension.
    * `joinOn` maps stream column → dimension column; `how` is any join
    * type valid for stream-static (inner / left_outer / left_semi /
    * left_anti).
    */
  def enrich(
      stream: DataFrame,
      dim: DataFrame,
      joinOn: Seq[(String, String)],
      how: String = "inner"): DataFrame = {
    require(joinOn.nonEmpty, "at least one join column pair required")
    val cond = joinOn.map { case (s, d) => stream(s) === dim(d) }.reduce(_ && _)
    stream.join(broadcast(dim), cond, how)
  }

  /** Event-time interval join: left rows matched to same-key right rows
    * with `rightTs <= leftTs <= rightTs + windowMinutes`. Inner append —
    * pairs emit as they match.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      windowMinutes: Int): DataFrame = {
    require(windowMinutes > 0, s"windowMinutes must be positive, got $windowMinutes")
    left.join(
      right,
      left(leftKey) === right(rightKey) &&
        left(leftTs) >= right(rightTs) &&
        left(leftTs) <= right(rightTs) + expr(s"INTERVAL $windowMinutes MINUTES"),
      "inner")
  }
}
