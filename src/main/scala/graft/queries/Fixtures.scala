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

  /** Best-effort recursive delete; false when anything was left behind.
    * The walk stream is closed (it holds an open directory fd).
    */
  private def deleteTree(root: java.nio.file.Path): Boolean =
    try {
      val s = java.nio.file.Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally s.close()
      true
    } catch { case _: Throwable => !java.nio.file.Files.exists(root) }

  private lazy val scratchHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      scratchRoots.forEach(root => { deleteTree(root); () })))

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

  /** Eagerly delete every scratch dir created so far. The bench calls this
    * between iterations (VERDICT r5 next #3): m13/m14/st1 each materialize
    * a full scratch target PER ITERATION, and parking those copies until
    * JVM exit let disk/page-cache pressure from early queries bleed into
    * later ones' timings. Safe whenever no in-flight query holds a scratch
    * target open — true between bench iterations by construction.
    */
  def purgeScratch(): Unit = {
    // A root whose delete fails (e.g. a file still being flushed) is
    // RE-QUEUED so the JVM-exit hook still owns it — poll-and-drop would
    // leak the very copies this mechanism exists to remove.
    val failed = scala.collection.mutable.ListBuffer.empty[java.nio.file.Path]
    var root = scratchRoots.poll()
    while (root != null) {
      if (!deleteTree(root)) failed += root
      root = scratchRoots.poll()
    }
    failed.foreach(scratchRoots.add)
  }

  /** The events table's `ts` parquet type has varied across testdata
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader only
    * accepts as a raw long under `nanosAsLong`) vs TIMESTAMP(MICROS)
    * (read natively as TIMESTAMP_NTZ). Normalize either to micros
    * TIMESTAMP_NTZ — the same granularity DuckDB's `epoch_us(ts)` oracle
    * side uses, keeping oracle parity.
    *
    * The nanos branch REQUIRES `spark.sql.legacy.parquet.nanosAsLong=true`
    * on the session. The graft mains (Verify/Bench) and the test base set
    * it at session construction; for any other session this sets it when
    * its EFFECTIVE value is not already "true" (ADVICE r2 #1: `getOption`
    * on a registered SQLConf falls back to the entry default and never
    * returns None, so an is-unset guard is dead code — the guard must
    * compare values).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (spark.conf.get(key, "false") != "true") spark.conf.set(key, "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
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

  /** Partition-scoped apply fixture (m13/m14): a target big enough that
    * the pruning win is MEASURABLE — ~2.2M rows at sf0.1 while the delta
    * stays ~0.3% (VERDICT r4 next #1: against the ~135k-row orders
    * target, the partitioned path's fixed overhead exceeded the whole
    * full-rewrite cost and the headline scale claim had no number).
    *
    * The merge key `li_key = l_orderkey * 8 + l_linenumber + rep << 21`
    * is unique: l_linenumber ∈ 1..7 makes the low 3 bits injective per
    * order, base keys stay below 2^21 at sf0.1 (max orderkey 149 999 →
    * li_key ≤ 1.2M), and each of the 4 replicas shifts into its own
    * 2^21-wide band. Replication multiplies the TARGET (what the full
    * rewrite must pay for) without touching the delta — exactly the
    * asymmetry the partition-scoped apply exists for.
    *
    * Target: 4 replicas of the lineitem rows of 90% of orders. Delta: the
    * lineitem rows of orders 1..1500 in replica 0 (~6k rows at sf0.1),
    * quantity bumped so matched rows always differ; the 10% of delta keys
    * absent from the target become inserts.
    */
  def lineitemKeyed(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .filter(col("l_orderkey") % 10 =!= 0)
      .crossJoin(broadcast(spark.range(4).select(col("id").as("__rep"))))
      .select(
        (col("l_orderkey") * 8 + col("l_linenumber") + col("__rep") * lit(1L << 21)).as("li_key"),
        col("l_quantity"), col("l_extendedprice"), col("l_returnflag"), col("l_shipdate"))

  /** Contiguous-keyrange delta — the "recent keys" incremental batch.
    * li_key <= 12007, so against range buckets of width 4096 (shift 12,
    * 64 buckets) it touches buckets {0,1,2} at EVERY scale factor. (The
    * replica bands shift buckets by (2^21/2^12) * rep = 512·rep ≡ 0
    * (mod 64), so replicas of the low-key rows share those buckets —
    * the touched slice holds all 4 replicas, only replica 0 matches.)
    */
  def lineitemKeyedDelta(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .filter(col("l_orderkey") <= 1500)
      .select((col("l_orderkey") * 8 + col("l_linenumber")).as("li_key"),
        (col("l_quantity") + lit(1.0)).as("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"), col("l_shipdate"))

  /** SQL twins of the two frames above. */
  val lineitemKeyedCtes: String =
    """WITH tgt AS (
      |  SELECT l_orderkey * 8 + l_linenumber + r * 2097152 AS li_key,
      |         l_quantity, l_extendedprice, l_returnflag, l_shipdate
      |  FROM lineitem CROSS JOIN range(4) tr(r) WHERE l_orderkey % 10 <> 0
      |), delta AS (
      |  SELECT l_orderkey * 8 + l_linenumber AS li_key,
      |         l_quantity + 1.0 AS l_quantity, l_extendedprice, l_returnflag, l_shipdate
      |  FROM lineitem WHERE l_orderkey <= 1500
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
