package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches over slices of a corpus — Spark's
  * native Apache DataSketches HLL expressions
  * (`hll_sketch_agg`/`hll_union_agg`/`hll_sketch_estimate`, codegen'd
  * aggregates, no UDFs) composed into the incremental-cardinality
  * pattern a 100 TB event lake actually runs: sketch each ingest slice
  * (day, source, snapshot) ONCE at write time, persist the few-KB
  * sketch rows beside the data, and answer "distinct users this
  * quarter / across sources" by unioning SKETCHES — history is never
  * rescanned, and slices compose in any grouping after the fact
  * (sketch union is associative and commutative, the property exact
  * distinct fundamentally lacks: exact per-day distincts cannot be
  * added across days).
  *
  * Approximation contract: a DataSketches HLL sketch is EXACT while it
  * remains in sparse (coupon) mode — up to roughly `0.75 · 2^lgConfigK`
  * distinct values per sketch — and a relative-error estimate
  * (~1.04/√2^lgConfigK) beyond; `lgConfigK` prices that trade
  * (default 14 ⇒ ~12k exact, ~0.8% error at scale). The fixture-scale
  * oracle relies on the exact regime; the spec pins estimate == exact
  * there and the error bound is the documented behavior past it.
  */
object Sketches {

  /** One HLL sketch per key group — the per-slice increment you persist.
    * Output `sketch` is the DataSketches binary; store it like any other
    * column (parquet `binary`).
    */
  def distinctSketches(
      df: DataFrame, keys: Seq[String], valueCol: String,
      lgConfigK: Int = 14): DataFrame = {
    require(keys.nonEmpty, "at least one grouping key required")
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgConfigK)).as("sketch"))
  }

  /** Union persisted sketches down to a distinct-count estimate per key
    * group — the read path: slices regroup freely (drop the slice key
    * from `keys` and days collapse into totals) without touching raw
    * history.
    */
  def unionEstimate(sketches: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one grouping key required")
    sketches.groupBy(keys.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(true)))
        .as("n_distinct"))
  }

  /** At-rest incremental composition (VERDICT r13 next #7): the sketch
    * rows persist as a bucket-partitioned merge target keyed by the
    * SLICE columns, so sketch ingest rides the machinery the merge tier
    * already has — [[appendSlices]] is a partition-scoped Keep-mode
    * upsert that rewrites only the buckets the arriving slices hash
    * into (a day's few-KB sketch row lands without touching the rest of
    * a years-deep store), crash windows are the merge protocol's own
    * (staged swap; `compact`/`recover` apply verbatim), and re-running
    * a slice's ingest REPLACES its sketch row — idempotent re-ingest,
    * the property a single running union sketch fundamentally lacks
    * (a sketch can only grow; a store of per-slice sketches can
    * re-derive any slice). The read path never rescans history:
    * [[storedEstimate]] unions the few-KB rows under any regrouping of
    * the slice keys.
    */
  def writeSketchStore(
      sliceSketches: DataFrame, path: String, sliceKeys: Seq[String],
      nBuckets: Int = 8,
      hashMode: graft.pipeline.HashMode = graft.pipeline.HashMode.Xxhash64): Unit =
    graft.merge.PartitionedTarget.write(
      sliceSketches, path,
      graft.merge.PartitionSpec(sliceKeys, nBuckets, hashMode))

  /** Upsert arriving slices' sketch rows into the store (the periodic
    * increment). Keys come from the store's own persisted spec; absent
    * slices are untouched (Keep mode), matching slices are replaced.
    */
  def appendSlices(
      spark: org.apache.spark.sql.SparkSession, path: String,
      sliceSketches: DataFrame): Unit = {
    val keys = graft.merge.PartitionedTarget.readSpec(spark, path).keys
    graft.merge.MergeApply.applyToPartitioned(
      spark, path, sliceSketches,
      graft.merge.MergeOptions(keys = keys, delete = graft.merge.DeleteMode.Ignore))
  }

  /** Distinct-count estimates straight off the persisted store, under
    * any regrouping of (a subset of) the slice keys.
    */
  def storedEstimate(
      spark: org.apache.spark.sql.SparkSession, path: String,
      keys: Seq[String]): DataFrame =
    unionEstimate(graft.merge.PartitionedTarget.read(spark, path), keys)

  /** Union arriving slice sketches INTO the store — the increment for
    * feeds that deliver a slice across many arrivals (a day's events
    * trickle in all day): read the stored rows of ONLY the buckets the
    * arriving slices hash to, union per slice, and replace through the
    * partition-scoped apply. HLL union is a join-semilattice (register
    * max / coupon-set union), so re-merging the same rows is a no-op on
    * every answer the store gives — at-least-once replay needs NO
    * watermark, the property that lets
    * [[graft.streaming.StreamingIndex.sketchStoreTo]] skip the
    * BM25/PQ tiers' whole batch-id protocol. Crash windows are the
    * apply's own staged swap: a batch either landed or it didn't, and
    * either way the replay converges to the same store.
    */
  def mergeIntoStore(
      spark: org.apache.spark.sql.SparkSession, path: String,
      arriving: DataFrame): Unit = {
    val spec = graft.merge.PartitionedTarget.readSpec(spark, path)
    val keys = spec.keys
    // Metadata-bounded collect: one bucket id per arriving slice group.
    val touched = arriving
      .select(spec.bucket(keys.map(arriving(_))).as("__b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val storedMatch = graft.merge.PartitionedTarget
      .readBuckets(spark, path, touched) match {
      case None => None
      case Some(stored) =>
        Some(stored.join(arriving.select(keys.map(arriving(_)): _*), keys, "left_semi"))
    }
    val merged = storedMatch.fold(arriving)(_.unionByName(arriving))
      .groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col("sketch"), lit(true)).as("sketch"))
    appendSlices(spark, path, merged)
  }
}
