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
}
