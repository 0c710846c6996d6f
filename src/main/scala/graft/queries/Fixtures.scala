package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic (target, source) merge fixtures derived from the driver's
  * parquet tables (TESTDATA.md) — the strategy FIXTURES.md §2 prescribes:
  * carve overlapping slices of one table and perturb the target so the merge
  * produces inserts, change-updates, no-op matches, and deletes. Every
  * derivation here has a character-for-character SQL twin in
  * [[MergeQueries]]' oracle CTEs.
  */
object Fixtures {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private val scratchRoots = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val scratchHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      scratchRoots.forEach { root =>
        try {
          java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => java.nio.file.Files.deleteIfExists(p))
        } catch { case _: Throwable => () }
      }))

  /** A fresh scratch directory, recursively deleted at JVM exit — for
    * queries that must materialize a target on disk (m13/m14/st1).
    * `Files.createTempDirectory` alone leaks full table copies across
    * repeated verify/bench runs (ADVICE r3 #5: deleteOnExit cannot remove
    * non-empty directories).
    */
  def scratchDir(prefix: String): String = {
    scratchHook
    val p = java.nio.file.Files.createTempDirectory(prefix)
    scratchRoots.add(p)
    p.toString
  }

  /** The events table carries TIMESTAMP(NANOS) parquet timestamps, which
    * Spark's vectorized reader rejects. Read the nanos as long and convert
    * to micros TIMESTAMP_NTZ — the same truncation DuckDB applies, keeping
    * oracle parity.
    *
    * REQUIRES `spark.sql.legacy.parquet.nanosAsLong=true` on the session.
    * The graft mains (Verify/Bench) and the test base set it at session
    * construction; for any other session this sets it when its EFFECTIVE
    * value is not already "true" (ADVICE r2 #1: `getOption` on a registered
    * SQLConf falls back to the entry default and never returns None, so an
    * is-unset guard is dead code — the guard must compare values).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (spark.conf.get(key, "false") != "true") spark.conf.set(key, "true")
    table(spark, dir, "events")
      .withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
  }

  /** Target slice of orders: 90% of keys, a third of the prices perturbed. */
  def ordersTarget(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .filter(col("o_orderkey") % 10 =!= 0)
      .withColumn(
        "o_totalprice",
        when(col("o_orderkey") % 3 === 0, col("o_totalprice") + lit(1.0))
          .otherwise(col("o_totalprice")))

  /** Source slice of orders: the truth, minus every 7th key. */
  def ordersSource(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders").filter(col("o_orderkey") % 7 =!= 0)

  /** SQL twins of the above (DuckDB dialect-compatible ANSI). */
  val ordersCtes: String =
    """WITH tgt AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus,
      |         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
      |         o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 10 <> 0
      |), src AS (
      |  SELECT * FROM orders WHERE o_orderkey % 7 <> 0
      |)""".stripMargin

  /** Contiguous-keyrange delta — the "recent keys" incremental batch: every
    * order with key <= 12000, prices bumped so matched rows always differ.
    * Against a range-bucketed target (shift 12 → width 4096) this touches
    * ~3 buckets regardless of SF — the partition-scoped apply fixture.
    */
  def ordersDelta(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .filter(col("o_orderkey") <= 12000)
      .withColumn("o_totalprice", col("o_totalprice") + lit(2.0))

  val ordersDeltaCte: String =
    """delta AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 2.0 AS o_totalprice,
      |         o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey <= 12000
      |)""".stripMargin

  /** Lineitem badKey fixture: key l_orderkey is massively duplicated. */
  def lineitemTarget(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .filter(col("l_suppkey") % 3 =!= 0)
      .withColumn(
        "l_quantity",
        when(col("l_linenumber") % 2 === 0, col("l_quantity") + lit(1.0))
          .otherwise(col("l_quantity")))

  def lineitemSource(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem").filter(col("l_partkey") % 5 =!= 0)

  /** Customer fixture with a genuinely NULL key value on both sides. */
  private def customerNullKey(df: DataFrame): DataFrame =
    df.withColumn(
      "c_custkey",
      when(col("c_custkey") === 1, lit(null).cast("long")).otherwise(col("c_custkey")))

  def customerTarget(spark: SparkSession, dir: String): DataFrame =
    customerNullKey(
      table(spark, dir, "customer")
        .filter(col("c_custkey") % 5 =!= 2)
        .withColumn(
          "c_acctbal",
          when(col("c_custkey") % 4 === 0, col("c_acctbal") + lit(1.0))
            .otherwise(col("c_acctbal"))))

  def customerSource(spark: SparkSession, dir: String): DataFrame =
    customerNullKey(table(spark, dir, "customer").filter(col("c_custkey") % 4 =!= 3))

  val customerCtes: String =
    """WITH tgt AS (
      |  SELECT CASE WHEN c_custkey = 1 THEN NULL ELSE c_custkey END AS c_custkey,
      |         c_name, c_nationkey,
      |         CASE WHEN c_custkey % 4 = 0 THEN c_acctbal + 1.0 ELSE c_acctbal END AS c_acctbal,
      |         c_mktsegment
      |  FROM customer WHERE c_custkey % 5 <> 2
      |), src AS (
      |  SELECT CASE WHEN c_custkey = 1 THEN NULL ELSE c_custkey END AS c_custkey,
      |         c_name, c_nationkey, c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 4 <> 3
      |)""".stripMargin
}
