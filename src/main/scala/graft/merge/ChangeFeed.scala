package graft.merge

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Apply a change feed to a [[PartitionedTarget]] ON DISK, rewriting and
    * swapping ONLY the bucket directories the feed's keys hash into —
    * CDC apply cost scales with the feed, not the target (the same pruning
    * contract as [[MergeApply.applyToPartitioned]], without the snapshot
    * merge's change detection the trusted log doesn't need). Delete-only
    * buckets are still in the touched set — a bucket whose every row is
    * `D`'d stages no output and the swap retires its directory. Runs under
    * the same staged-write + intent-marker protocol, so
    * [[MergeApply.recover]] rolls back a crash mid-swap.
    *
    * @return the touched bucket ids (metadata-sized; empty feed → empty).
    */
  def applyToPartitioned(
      spark: SparkSession, targetPath: String, feed: DataFrame,
      keys: Seq[String], opCol: String = "op"): Seq[Int] = {
    import PartitionedTarget.BucketCol
    require(keys.nonEmpty, "at least one key column required")
    require(feed.columns.contains(opCol), s"feed must carry the op column '$opCol'")
    val spec = PartitionedTarget.readSpec(spark, targetPath)
    if (spec.keys.map(_.toLowerCase) != keys.map(_.toLowerCase))
      throw new MergeValidationException(
        s"Partition spec keys [${spec.keys.mkString(",")}] do not match feed keys [${keys.mkString(",")}]")

    // Two consumers (touched-bucket collect + the apply join): pin the
    // feed unless the caller already did — the PartitionedApply discipline.
    val callerPinned = feed.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val pinned = if (callerPinned) feed else feed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val feedKeyCols = keys.map(k =>
        pinned(pinned.columns.find(_.equalsIgnoreCase(k)).getOrElse(
          throw new MergeValidationException(s"Key column [$k] missing from feed"))))
      val touched = pinned.select(spec.bucket(feedKeyCols).as("b"))
        .distinct().collect().map(_.getInt(0)).sorted.toSeq
      if (touched.isEmpty) return Seq.empty

      val tgt = new Path(targetPath)
      val fs = tgt.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val token = UUID.randomUUID().toString.take(8)
      val staging = new Path(tgt.getParent, s".${tgt.getName}.staging-$token")

      val slice = PartitionedTarget.readBuckets(spark, targetPath, touched)
        .getOrElse(spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(
            pinned.schema.fields.filterNot(_.name == opCol))))
      val next = apply(slice, pinned, keys, opCol)
      val withBucket = next.withColumn(BucketCol, spec.bucket(keys.map(next(_))))
      PartitionedApply.writePartitionedOrCleanup(withBucket, staging, fs)
      PartitionedApply.swapBuckets(spark, fs, tgt, staging, touched, token)
      MergeApply.stampLastUpdate(fs, tgt)
      touched
    } finally if (!callerPinned) pinned.unpersist()
  }
}
