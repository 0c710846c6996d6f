package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key admission quota — ingest-side rate control: admit
  * at most `quota` rows per key (source, domain, tenant) over the
  * stream's LIFETIME, in arrival order, and drop the rest at the door.
  * The ingest counterpart of [[graft.pipeline.Sampling.capPerStratum]]:
  * the batch cap picks a frozen-uniform subset by hash rank, the quota
  * admits the FIRST `quota` arrivals — what admission control means when
  * rows arrive over time and a late flood from one crawl must not evict
  * rows already accepted downstream.
  *
  * Scale shape: state is ONE long counter per key ever seen — never the
  * rows; each micro-batch shuffles only its own rows to their key's
  * state partition, and a saturated key's rows are discarded there
  * without touching the sink. Within a micro-batch the group's slice is
  * buffered and sorted by the row id (micro-batch iterator order is
  * arbitrary; sorting makes the admitted set deterministic on a replay
  * that preserves batch boundaries) — the buffer is bounded by the
  * batch's rows for that key, not by history.
  */
object StreamingQuota {

  /** Admit `(key, id)` rows while the key's lifetime admission count is
    * below `quota`. Append-mode output: an admitted row is emitted in
    * the micro-batch it arrives in, exactly once.
    */
  def admit(stream: Dataset[(String, Long)], quota: Int): Dataset[(String, Long)] = {
    require(quota >= 1, s"quota must be >= 1, got $quota")
    import stream.sparkSession.implicits._
    stream
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(step(quota))
  }

  private[streaming] def step(quota: Int)(
      key: String,
      rows: Iterator[(String, Long)],
      state: GroupState[Long]): Iterator[(String, Long)] = {
    val admittedSoFar = state.getOption.getOrElse(0L)
    val room = math.max(0L, quota - admittedSoFar).toInt
    val admitted = rows.toSeq.sortBy(_._2).take(room)
    if (admitted.nonEmpty) state.update(admittedSoFar + admitted.length)
    admitted.iterator
  }
}
