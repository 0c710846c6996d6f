package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{AnalyticQueries, IngestQueries, MergeQueries, PipelineQueries, StreamingQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the core SimpleMerge semantics (full-outer-join merge with delete).
    */
  def entry(spark: SparkSession): DataFrame =
    MergeQueries.queries("m1_merge_delete")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    MergeQueries.queries ++ AnalyticQueries.queries ++ PipelineQueries.queries ++
      StreamingQueries.queries ++ IngestQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    MergeQueries.oracleSql ++ AnalyticQueries.oracleSql ++ PipelineQueries.oracleSql ++
      StreamingQueries.oracleSql ++ IngestQueries.oracleSql
}
