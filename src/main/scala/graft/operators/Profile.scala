package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the lake-health report run before trusting a new
  * snapshot: per column, row count, null count, exact distinct count,
  * and min/max rendered as strings so heterogeneous columns share one
  * report schema.
  *
  * Scale shape: one aggregation pass PER COLUMN, each scan pruned to
  * that single column (parquet column pruning makes the per-column scan
  * ~free relative to a full-width read), partial aggregation map-side.
  * The exact distinct count is the honest-reporting choice and costs a
  * shuffle of the column's distinct values; at extreme cardinality swap
  * in `approx_count_distinct` (the q18 HLL path) — same report schema.
  *
  * Min/max stringification caveat: float formatting differs across
  * engines ("1.0E-4" vs "0.0001"), so cross-engine oracle use should
  * profile integral/string/date columns or pre-round floats.
  */
object Profile {

  private def one(df: DataFrame, c: String): DataFrame =
    df.agg(
      lit(c).as("col_name"),
      count(lit(1)).as("n_rows"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
      count_distinct(col(c)).as("n_distinct"),
      min(col(c)).cast("string").as("min_val"),
      max(col(c)).cast("string").as("max_val"))

  /** One report row per requested column. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column required")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    cols.map(one(df, _)).reduce(_ unionByName _)
  }

  /** The N heaviest join-key groups with their corpus share — the
    * pre-flight a join strategy decision reads at 100 TB: a top key
    * holding 5% of rows means the unsalted window/join stalls on one
    * task (the `badKeySalt`/AQE-skew-join signal); a flat top-N means
    * plain hash partitioning is fine.
    *
    * Scale shape: one map-side-combined groupBy on the keys, then
    * TakeOrdered for the top-N (no global sort, no single-partition
    * window over the full key census) and a 1-row broadcast total for the
    * share; the rank window runs over the N collected rows only.
    * Deterministic under count ties (key-ascending tiebreak).
    */
  def heavyKeys(df: DataFrame, keys: Seq[String], topN: Int = 20): DataFrame = {
    require(keys.nonEmpty, "at least one key column required")
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum("n_rows").cast("double").as("__graft_total"))
    val ord = col("n_rows").desc +: keys.map(col(_).asc)
    val w = org.apache.spark.sql.expressions.Window.orderBy(ord: _*)
    counts.orderBy(ord: _*).limit(topN)
      .crossJoin(broadcast(total))
      .withColumn("share", round(col("n_rows") / col("__graft_total"), 6))
      .withColumn("rnk", row_number().over(w))
      .drop("__graft_total")
  }

  /** Log2 histogram of key-group sizes — the distribution the heavy-key
    * head belongs to: for each bucket `b`, the number of distinct keys
    * whose group size lands in [2^b, 2^(b+1)) and the rows they hold.
    * The bucket index is derived from the BINARY STRING length of the
    * count (exact integer logic — `floor(log2(n))` in doubles misbuckets
    * exact powers of two on some engines). Aggregation-only: one key
    * shuffle + one metadata-sized bucket rollup.
    */
  def keySizeHistogram(df: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column required")
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    counts
      .withColumn("bucket", (length(conv(col("n"), 10, 2)) - 1).cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_keys"), sum("n").as("n_rows"))
      .withColumn("min_group_size", expr("shiftleft(CAST(1 AS BIGINT), bucket)"))
      .select("bucket", "min_group_size", "n_keys", "n_rows")
      .orderBy("bucket")
  }
}
