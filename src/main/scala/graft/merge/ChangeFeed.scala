package graft.merge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC change-feed application — the merge variant where the source is
  * not a full snapshot to DIFF against (the [[MergeFrame]] contract) but
  * an authoritative stream of per-row operations (Debezium/CDC shape):
  * `D` removes the key, `U`/`I` upsert the row, keys absent from the
  * feed are untouched. The feed is TRUSTED — no change detection, no
  * not-matched-by-source handling; that is exactly the semantic gap
  * between applying a snapshot and applying a log.
  *
  * Scale shape: one key-wise anti-join (broadcast when the feed is a
  * small delta — the normal CDC case) + a union; cost ∝ target scan +
  * |feed|, and composes with [[PartitionedTarget]] the same way any
  * merged frame does.
  */
object ChangeFeed {

  /** Apply a change feed to a target.
    *
    * @param feed   target-schema rows plus `opCol` ∈ {I, U, D}
    *               (case-insensitive); for `D` rows only the key columns
    *               are read. One row per key — a raw multi-op log must be
    *               collapsed to its latest op per key upstream (window on
    *               the log's sequence column), since "latest" is the
    *               log's notion of order, not this operator's.
    * @param keys   merge key columns (null-safe matched).
    */
  def apply(target: DataFrame, feed: DataFrame, keys: Seq[String], opCol: String = "op"): DataFrame = {
    require(keys.nonEmpty, "at least one key column required")
    require(feed.columns.contains(opCol), s"feed must carry the op column '$opCol'")
    val feedKeys = feed.select(keys.map(col): _*).distinct()
    val cond = keys.map(k => target(k) <=> feedKeys(k)).reduce(_ && _)
    val untouched = target.join(feedKeys, cond, "left_anti")
    val upserts = feed.filter(upper(col(opCol)).isin("I", "U")).drop(opCol)
    untouched.unionByName(upserts)
  }
}
