package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with CUSTOM state — the
  * `flatMapGroupsWithState` tier of the streaming layer, for the state
  * shape windows can't express: a gap-based session is open-ended (its
  * close time depends on future events), so per-key state must carry the
  * open session until either a later event exceeds the gap or the
  * event-time watermark passes it (timeout → emit + drop state).
  *
  * The streaming twin of [[graft.operators.Sessionize.byGap]]: on a
  * time-ordered replay the emitted sessions converge to the batch
  * operator's exact output (oracle-checked by st4 against the same SQL
  * as the batch t6 query).
  *
  * Scale shape: state is ONE small fixed-size record per key
  * (idx/start/end/count — never the events); the event-time timeout
  * flushes idle keys' open sessions as the watermark advances, leaving
  * a few-longs counter marker (lifetime session numbering needs it —
  * see [[step]] for the strictly-bounded alternative); each micro-batch
  * shuffles only its own rows to their key's state partition.
  */
object StreamingSessionize {

  /** Open-session state: 1-based session index, bounds and count in
    * epoch micros — a handful of longs per active key.
    */
  case class OpenSession(idx: Long, start_us: Long, end_us: Long, n: Long)

  /** One closed session. `key` is the grouping value as a string (cast
    * back to the source type when joining/oracling — state encoders want
    * a concrete key type, and string round-trips every primitive).
    */
  case class ClosedSession(key: String, session_idx: Long, n_events: Long, start_us: Long, end_us: Long)

  /** Close sessions for `key` given this batch's event times (sorted
    * here — within a micro-batch arrival order is arbitrary): events
    * within `gapUs` of the open session's end extend it, a larger gap
    * closes it and opens the next. On event-time timeout the open
    * session is emitted and the key's state dropped — an inactive key
    * costs nothing once the watermark passes its session end + gap.
    */
  private[streaming] def step(gapUs: Long)(
      key: String,
      events: Iterator[(String, Long, java.sql.Timestamp)],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    if (!events.hasNext && state.hasTimedOut) {
      // Emit the open session but KEEP the index counter as an n=0
      // "closed" marker (no further timeout set): the batch semantics
      // number sessions per key over the key's LIFETIME, so dropping
      // state on timeout would restart a long-idle key at 1. The marker
      // is a few longs per key ever seen — the honest cost of lifetime
      // numbering (a deployment wanting strictly bounded state numbers
      // sessions by start time instead and can remove() here).
      val s = state.get
      state.update(s.copy(n = 0))
      if (s.n > 0) Iterator(ClosedSession(key, s.idx, s.n, s.start_us, s.end_us))
      else Iterator.empty
    } else {
      val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
      var cur = state.getOption.orNull
      for (us <- events.map(_._2).toArray.sorted) {
        if (cur == null) cur = OpenSession(1, us, us, 1)
        else if (cur.n == 0) cur = OpenSession(cur.idx + 1, us, us, 1) // reopen after timeout
        else if (us - cur.end_us <= gapUs) cur = cur.copy(end_us = us, n = cur.n + 1)
        else {
          out += ClosedSession(key, cur.idx, cur.n, cur.start_us, cur.end_us)
          cur = OpenSession(cur.idx + 1, us, us, 1)
        }
      }
      state.update(cur)
      // Timeout when the watermark passes the gap horizon. Guard: a
      // session already older than the watermark (long-idle key whose
      // batch arrived late in the replay) must still get a LEGAL timeout
      // (strictly beyond the current watermark) — it fires next batch.
      state.setTimeoutTimestamp(
        math.max(cur.end_us / 1000L + gapUs / 1000L, state.getCurrentWatermarkMs() + 1L))
      out.iterator
    }
  }

  /** Sessionize a watermarked event stream by inactivity gap.
    *
    * @param events streaming frame; `tsCol` must be a TIMESTAMP column
    *               WITH a watermark already defined on it (the event-time
    *               timeout needs one)
    * @param keyCol session key (any primitive — carried as string in
    *               `key`)
    * @return append-mode stream of closed sessions
    *         (key, session_idx, n_events, start_us, end_us)
    */
  def byGap(events: DataFrame, keyCol: String, tsCol: String, gapMinutes: Int): Dataset[ClosedSession] = {
    require(gapMinutes > 0, s"gapMinutes must be positive, got $gapMinutes")
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    // The watermarked TIMESTAMP column must reach the grouped Dataset —
    // projecting it away drops the watermark the event-time timeout needs
    // ("Event-time timeout not supported without watermark").
    events
      .select(col(keyCol).cast("string").as("key"), unix_micros(col(tsCol)).as("us"),
        col(tsCol).as("__wm_ts"))
      .as[(String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step(gapUs))
  }
}
