package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Output-layout management: the small-files problem is the dominant
  * operational failure of 100 TB pipelines (a merge or dedup writing
  * thousands of kilobyte files per partition poisons every downstream
  * scan). [[writeSized]] repartitions to hit a target file size using the
  * optimizer's size estimate for the plan.
  *
  * The estimate is the IN-MEMORY size (`plan.stats.sizeInBytes`), which
  * typically overshoots the on-disk parquet size 2-4× after encoding and
  * compression — so the target is an upper-bound knob, not a promise;
  * callers tuning exact file sizes should measure a written sample and
  * scale the target accordingly.
  */
object Layout {

  /** Number of output partitions that lands files near targetFileBytes. */
  def partitionsFor(df: DataFrame, targetFileBytes: Long): Int = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive, got $targetFileBytes")
    val estimated = df.queryExecution.optimizedPlan.stats.sizeInBytes
    ((estimated + targetFileBytes - 1) / targetFileBytes).max(1).min(Int.MaxValue).toInt
  }

  /** Write `df` as parquet with file count chosen from the size estimate. */
  def writeSized(df: DataFrame, path: String, targetFileBytes: Long = 128L << 20): Unit =
    df.repartition(partitionsFor(df, targetFileBytes))
      .write.mode(SaveMode.Overwrite).parquet(path)
}
