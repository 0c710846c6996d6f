package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.merge._

/** Driver-contract queries for the merge-runtime operator layer (SURVEY §2
  * layer A). Each entry pairs a DataFrame pipeline built on the engine with
  * an independent ANSI-SQL oracle (full-outer-join + CASE disposition form)
  * that DuckDB executes over the same parquet tables.
  */
object MergeQueries {
  import Fixtures._

  private val ordersCols =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
  private val ordersPayload = ordersCols.drop(1)

  /** SQL for the merged projection: source values on insert/match, target
    * otherwise — per-column CASE, key via coalesce.
    */
  private def mergedSelect(cols: Seq[String], keys: Set[String], srcCols: Set[String]): String =
    cols.map { c =>
      if (keys.contains(c)) s"coalesce(s.$c, t.$c) AS $c"
      else if (srcCols.contains(c)) s"CASE WHEN s.__s_p IS NOT NULL THEN s.$c ELSE t.$c END AS $c"
      else s"t.$c AS $c"
    }.mkString(",\n       ")

  private def ordersJoin: String =
    """FROM (SELECT *, 1 AS __t_p FROM tgt) t
      |FULL OUTER JOIN (SELECT *, 1 AS __s_p FROM src) s
      |  ON t.o_orderkey = s.o_orderkey""".stripMargin

  private val ordersChangedPred = ordersPayload
    .map(c => s"t.$c IS NOT DISTINCT FROM s.$c")
    .mkString("(", " AND ", ")")

  private def ordersMerge(spark: SparkSession, dir: String): SimpleMerge =
    SimpleMerge.into(ordersTarget(spark, dir), "tgt")
      .using(ordersSource(spark, dir), "src")
      .keys("o_orderkey")

  // ---- queries ----

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Schema evolution (m18): the source arrives with a NEW column; the
    // opt-in evolveTarget pre-pass appends it to the target as typed
    // NULL, the standard merge then flows it — matched rows pick the
    // value up on the same merge, keep-mode target-only rows carry NULL
    // history. Without the pre-pass the widened source is rejected
    // (spec-pinned), never silently reinterpreted.
    "m18_merge_evolve" -> ((s, dir) => {
      val src = ordersSource(s, dir)
        .withColumn("o_channel", concat(lit("ch"), (col("o_orderkey") % 4).cast("string")))
      val tgt = SimpleMerge.evolveTarget(ordersTarget(s, dir), src)
      SimpleMerge.into(tgt, "tgt").using(src, "src")
        .keys("o_orderkey").delete("NO")
        .merged.orderBy("o_orderkey")
    }),
    "m1_merge_delete" -> ((s, dir) =>
      ordersMerge(s, dir).delete("YES").merged.orderBy("o_orderkey")),
    "m2_merge_keep" -> ((s, dir) =>
      ordersMerge(s, dir).delete("NO").merged.orderBy("o_orderkey")),
    "m3_merge_softdelete" -> ((s, dir) =>
      ordersMerge(s, dir).delete("set o_orderstatus = 'X'").merged.orderBy("o_orderkey")),
    "m4_merge_filtered" -> ((s, dir) =>
      ordersMerge(s, dir).delete("YES")
        .targetFilter("o_orderdate >= '1998-01-01'")
        .merged.orderBy(ordersCols.map(col): _*)),
    "m5_merge_audit" -> ((s, dir) =>
      ordersMerge(s, dir).delete("YES").audit.drop("actionTime").orderBy("o_orderkey")),
    "m6_merge_badkey" -> ((s, dir) => {
      val m = SimpleMerge.into(lineitemTarget(s, dir), "tgt")
        .using(lineitemSource(s, dir), "src")
        .keys("l_orderkey")
        .badKey(true).delete("YES")
      m.merged.orderBy(m.merged.columns.toIndexedSeq.map(col): _*)
    }),
    // Skew-safe badKey: same merge as m6 through the two-phase salted
    // rank — multiset-identical result, hot keys spread over 8 buckets.
    "m12_merge_badkey_salted" -> ((s, dir) => {
      val m = SimpleMerge.into(lineitemTarget(s, dir), "tgt")
        .using(lineitemSource(s, dir), "src")
        .keys("l_orderkey")
        .badKeySalt(8).delete("YES")
      m.merged.orderBy(m.merged.columns.toIndexedSeq.map(col): _*)
    }),
    "m7_merge_nullkey" -> ((s, dir) => {
      val m = SimpleMerge.into(customerTarget(s, dir), "tgt")
        .using(customerSource(s, dir), "src")
        .keys("c_custkey").delete("NO")
      m.merged.orderBy(col("c_custkey").asc_nulls_first)
    }),
    "m8_merge_actions" -> ((s, dir) =>
      ordersMerge(s, dir).delete("YES").audit
        .groupBy("action").agg(count(lit(1)).as("n")).orderBy("action")),
    "m9_merge_variance" -> ((s, dir) => varianceFrame(s, dir)),
    "m10_merge_subset_source" -> ((s, dir) => {
      val m = SimpleMerge.into(ordersTarget(s, dir), "tgt")
        .using(ordersSource(s, dir).drop("o_orderpriority"), "src")
        .keys("o_orderkey").delete("NO")
      m.merged.orderBy("o_orderkey")
    }),
    // Debug render pinned as DATA (VERDICT r1 #5): clause-presence facts of
    // the rendered MERGE + audit DDL, hash-checked against constants the
    // reference's worked example mandates (README.md:60-101).
    "g1_debug_render" -> ((s, dir) => {
      val m = ordersMerge(s, dir).delete("YES").threshold("15%")
      val sql = MergeDebug.renderSql(m.plan, "tgt", "src")
      val ddl = MergeDebug.auditDdl(m.plan, "tgt_SimpleMergeOutput")
      import s.implicits._
      Seq((
        sql.contains("MERGE INTO tgt AS t"),
        sql.contains("USING src AS s"),
        sql.contains("ON t.`o_orderkey` <=> s.`o_orderkey`"),
        sql.contains("WHEN MATCHED AND struct(s.`o_custkey`, s.`o_orderstatus`, s.`o_totalprice`, s.`o_orderdate`, s.`o_orderpriority`) IS DISTINCT FROM"),
        "t\\.`o_\\w+` = s\\.`o_\\w+`".r.findAllIn(sql).size.toLong,
        sql.contains("WHEN NOT MATCHED THEN INSERT (`o_orderkey`, `o_custkey`, `o_orderstatus`, `o_totalprice`, `o_orderdate`, `o_orderpriority`)"),
        sql.contains("WHEN NOT MATCHED BY SOURCE THEN DELETE"),
        ddl.startsWith("CREATE TABLE tgt_SimpleMergeOutput (actionTime TIMESTAMP NOT NULL,action STRING NOT NULL,o_orderkey BIGINT,d_o_custkey"),
        ddl.indexOf("d_o_orderpriority") < ddl.indexOf("i_o_custkey"), // d_* block precedes i_* block
        "15%"
      )).toDF("has_merge_into", "has_using", "has_nullsafe_on", "has_matched_distinct",
        "n_update_assignments", "has_insert_in_source_order", "has_nmbs_delete",
        "audit_ddl_prefix_ok", "audit_d_block_first", "threshold")
    }),
    // CDC change-feed apply (A-family extension / m15): the log-shaped
    // merge — op codes trusted, no snapshot diff. Feed: D for target
    // keys %13=0, U for source∩target keys, I for source-only keys.
    // CDC extraction (C153 / m20): the inverse of m15 — DIFF two
    // snapshots into the I/U/D feed, closing the loop for sources that
    // can only deliver full snapshots: diff once, ship/apply the
    // few-row feed instead of the table. One null-safe full-outer join,
    // change detection as a single struct <=>; the round-trip law
    // apply(old, diff(old, new)) == new is spec-pinned.
    "m20_snapshot_diff" -> ((s, dir) =>
      ChangeFeed.diff(
          Fixtures.ordersTarget(s, dir), Fixtures.ordersSource(s, dir),
          Seq("o_orderkey"))
        .orderBy("o_orderkey")),
    "m15_cdc_apply" -> ((s, dir) => {
      val t = Fixtures.ordersTarget(s, dir)
      val src = Fixtures.ordersSource(s, dir)
      val tKeys = t.select("o_orderkey")
      val dels = t.filter(col("o_orderkey") % 13 === 0).withColumn("op", lit("D"))
      val updates = src.join(tKeys, Seq("o_orderkey"), "left_semi")
        .filter(col("o_orderkey") % 13 =!= 0).withColumn("op", lit("U"))
      val inserts = src.join(tKeys, Seq("o_orderkey"), "left_anti")
        .withColumn("op", lit("I"))
      ChangeFeed.apply(t, dels.unionByName(updates).unionByName(inserts),
        Seq("o_orderkey"))
        .orderBy("o_orderkey")
    }),
    // SCD Type-2 history merge (A-family extension / m16): the snapshot
    // apply that never loses information — matched-and-changed rows are
    // CLOSED (valid_to = version) and re-opened from the source; keys
    // that left the snapshot close; already-closed history (here: a
    // prior-price version for every %7 key) passes through untouched.
    // One null-safe full-outer join + a map-side 1-or-2-row explode.
    "m16_scd2_history" -> ((s, dir) => {
      val hist = Fixtures.ordersTarget(s, dir)
        .filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") - lit(5.0))
        .withColumn("valid_from", lit(-1L))
        .withColumn("valid_to", lit(0L))
        .withColumn("is_current", lit(false))
      val cur = Fixtures.ordersTarget(s, dir)
        .withColumn("valid_from", lit(0L))
        .withColumn("valid_to", lit(null).cast("bigint"))
        .withColumn("is_current", lit(true))
      Scd2.apply(hist.unionByName(cur), Fixtures.ordersSource(s, dir),
          Seq("o_orderkey"), version = 1L)
        .orderBy(col("o_orderkey"), col("valid_from"), col("is_current"))
    }),
    // SCD2 point-in-time read (m17): the round-trip law that makes the
    // history merge trustworthy — after applying the snapshot at
    // version 1, snapshotAt(0) must reproduce the pre-merge current
    // state EXACTLY and snapshotAt(1) the applied snapshot, both straight
    // off the history frame with a map-only interval filter.
    "m17_scd2_snapshot" -> ((s, dir) => {
      val cur = Fixtures.ordersTarget(s, dir)
        .withColumn("valid_from", lit(0L))
        .withColumn("valid_to", lit(null).cast("bigint"))
        .withColumn("is_current", lit(true))
      val merged = Scd2.apply(cur, Fixtures.ordersSource(s, dir),
        Seq("o_orderkey"), version = 1L)
      Scd2.snapshotAt(merged, 0L).withColumn("as_of_v", lit(0L))
        .unionByName(Scd2.snapshotAt(merged, 1L).withColumn("as_of_v", lit(1L)))
        .orderBy("as_of_v", "o_orderkey")
    }),
    // PIT feature enrichment (m19): the leakage-safe feature attach —
    // every event joins the customer-attribute VERSION valid at the
    // event's OWN timestamp, never a later one (enriching from the
    // current dimension, st8's shape, is exactly the temporal leak this
    // prevents in a training pipeline). Two-version history planted at
    // the corpus midpoint; one equi-join on the key with the interval
    // bounds as the join filter — no range fan-out, no window.
    "m19_pit_enrich" -> ((s, dir) => {
      val ev = Fixtures.events(s, dir)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      val b = ev.agg(min(col("ts_us")), max(col("ts_us"))).head()
      val mid = (b.getLong(0) + b.getLong(1)) / 2
      val cust = Fixtures.table(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val hist = cust.select(col("c_custkey"), col("c_mktsegment").as("seg"),
          lit(0L).as("valid_from"), lit(mid).as("valid_to"))
        .unionByName(cust.select(col("c_custkey"),
          concat(col("c_mktsegment"), lit("_2")).as("seg"),
          lit(mid).as("valid_from"), lit(null).cast("bigint").as("valid_to")))
      Scd2.enrichAsOf(ev, hist, Seq("user_id" -> "c_custkey"), "ts_us")
        .orderBy("event_id")
    }),
    // Hard-mode debug render (FIXTURES §1.2 shape): composite key +
    // badKey rn-dedup CTEs + target filter + soft-delete SET + threshold
    // — the renderer paths g1's simple config never reaches.
    "g2_debug_render_hard" -> ((s, dir) => {
      val m = ordersMerge(s, dir)
        .keys("o_orderkey", "o_custkey")
        .badKey(true)
        .targetFilter("o_totalprice >= 1000")
        .delete("set o_orderstatus = 'X'")
        .threshold("15%")
      val sql = MergeDebug.renderSql(m.plan, "tgt", "src")
      val ddl = MergeDebug.auditDdl(m.plan, "tgt_SimpleMergeOutput")
      import s.implicits._
      Seq((
        sql.contains("WITH target AS (SELECT *, row_number() OVER (PARTITION BY `o_orderkey`, `o_custkey` ORDER BY monotonically_increasing_id()) AS _SimpleMerge_rn FROM (SELECT * FROM tgt WHERE o_totalprice >= 1000))"),
        sql.contains("source AS (SELECT *, row_number() OVER (PARTITION BY `o_orderkey`, `o_custkey` ORDER BY monotonically_increasing_id()) AS _SimpleMerge_rn FROM (SELECT * FROM src))"),
        sql.contains("ON t.`o_orderkey` <=> s.`o_orderkey`") &&
          sql.contains("t.`o_custkey` <=> s.`o_custkey`"),
        sql.contains("t._SimpleMerge_rn = s._SimpleMerge_rn"),
        "t\\.`o_\\w+` = s\\.`o_\\w+`".r.findAllIn(sql).size.toLong,
        sql.contains("WHEN NOT MATCHED BY SOURCE THEN UPDATE SET t.`o_orderstatus` = 'X'"),
        ddl.startsWith("CREATE TABLE tgt_SimpleMergeOutput (actionTime TIMESTAMP NOT NULL,action STRING NOT NULL,o_orderkey BIGINT,o_custkey BIGINT,d_o_orderstatus"),
        "15%"
      )).toDF("has_badkey_target_cte", "has_badkey_source_cte", "on_composite_nullsafe",
        "has_rn_tiebreak", "n_update_assignments", "has_soft_delete_set",
        "audit_ddl_composite_keys", "threshold")
    }),
    // B10 execute boundary closed (g3 / VERDICT r10 next #4): the merge is
    // driven ENTIRELY by MERGE INTO SQL text — rendered by MergeDebug,
    // parsed by Spark's own parser into MergeIntoTable, translated back
    // into the engine by MergeSql — and must hash-match m1's oracle, which
    // pins the round trip render → parse → execute ≡ API.
    "g3_merge_sql" -> ((s, dir) => {
      ordersTarget(s, dir).createOrReplaceTempView("g3_tgt")
      ordersSource(s, dir).createOrReplaceTempView("g3_src")
      val sql = MergeDebug.renderSql(
        ordersMerge(s, dir).delete("YES").plan, "g3_tgt", "g3_src")
      MergeSql.mergedFrame(s, sql).orderBy("o_orderkey")
    }),
    // The CTE-wrapped render round trip (g4): m6's badKey merge rendered
    // to WITH-prefixed MERGE text, parsed back (the _SimpleMerge_rn
    // window folded into the badKey option), executed — shares m6's
    // oracle, the g3/m1 precedent.
    "g4_merge_sql_cte" -> ((s, dir) => {
      lineitemTarget(s, dir).createOrReplaceTempView("g4_tgt")
      lineitemSource(s, dir).createOrReplaceTempView("g4_src")
      val m = SimpleMerge.into(lineitemTarget(s, dir), "g4_tgt")
        .using(lineitemSource(s, dir), "g4_src")
        .keys("l_orderkey").badKey(true).delete("YES")
      val out = MergeSql.mergedFrame(s, MergeDebug.renderSql(m.plan, "g4_tgt", "g4_src"))
      out.orderBy(out.columns.toIndexedSeq.map(col): _*)
    }),
    // Threshold verdict as data (A22/A23): the variance arithmetic and the
    // commit/abort decision for a 1% threshold, oracle-checked.
    "m11_threshold_verdict" -> ((s, dir) =>
      varianceFrame(s, dir)
        .withColumn("would_commit", col("affected_rows") * lit(100.0) / col("target_rows") <= lit(1.0))),
    // Partition-scoped incremental apply (VERDICT r2 next #1): range-
    // bucketed target, contiguous-keyrange delta → only 3 of 64 bucket
    // dirs are read/rewritten/swapped. Output keeps the bucket column so
    // the oracle recomputes the bucket function cross-engine for EVERY
    // row. m14 is the same logical merge through the full-rewrite path —
    // identical oracle. Setup (target fixture build) and the apply are
    // SEPARATE methods so the bench can time the apply alone
    // (BenchPhases; VERDICT r3 "what's wrong" #1 — timing setup+apply
    // made the partitioned path look slower than the full rewrite). The
    // fixture is the lineitem-derived li_key frame (~2.16M target rows —
    // 4 key-shifted replicas of ~540k — vs ~6k delta rows at sf0.1) so
    // the apply-time comparison measures pruning, not fixed overhead
    // (VERDICT r4 next #1).
    "m13_merge_partitioned" -> ((s, dir) => {
      val root = m13Setup(s, dir)
      m13Apply(s, root)
      s.read.parquet(s"$root/t")
        .withColumn("bucket", col(PartitionedTarget.BucketCol).cast("long"))
        .drop(PartitionedTarget.BucketCol)
        .orderBy("li_key")
    }),
    "m14_merge_full_rewrite" -> ((s, dir) => {
      val root = m14Setup(s, dir)
      m14Apply(s, root)
      val out = s.read.parquet(s"$root/t")
      out.withColumn("bucket", m13Spec.bucket(Seq(out("li_key"))).cast("long"))
        .orderBy("li_key")
    }),
    // MERGE-as-SQL against a partitioned target (g5): m13's logical merge
    // arrives as rendered MERGE INTO text; MergeSql.applyToTarget parses
    // it and — because the target path carries the partition-spec
    // sidecar — routes into the partition-scoped apply (3 of 64 buckets
    // touched; pruning pinned in MergeSqlSpec). Same disk state as m13,
    // so it shares m13's oracle verbatim (the g3/m1 precedent).
    "g5_merge_sql_partitioned" -> ((s, dir) => {
      val root = m13Setup(s, dir)
      MergeSql.applyToTarget(s, g5RenderSql(s, root), s"$root/t")
      s.read.parquet(s"$root/t")
        .withColumn("bucket", col(PartitionedTarget.BucketCol).cast("long"))
        .drop(PartitionedTarget.BucketCol)
        .orderBy("li_key")
    }),
    // Schema evolution from SQL text (g6): Spark 4's lakehouse opt-in
    // syntax — `MERGE WITH SCHEMA EVOLUTION INTO` — routed into the
    // C116 evolveTarget pre-pass, so m18's semantics execute from a
    // statement (without the keyword the widened source is still
    // rejected, spec-pinned). Shares m18's oracle verbatim.
    "g6_merge_sql_evolve" -> ((s, dir) => {
      ordersTarget(s, dir).createOrReplaceTempView("g6_tgt")
      ordersSource(s, dir)
        .withColumn("o_channel", concat(lit("ch"), (col("o_orderkey") % 4).cast("string")))
        .createOrReplaceTempView("g6_src")
      MergeSql.mergedFrame(s,
        """MERGE WITH SCHEMA EVOLUTION INTO g6_tgt t USING g6_src s
          |ON t.o_orderkey = s.o_orderkey
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        .orderBy("o_orderkey")
    })
  )

  /** Register the g5 views over an [[m13Setup]] root and render m13's
    * logical merge as MERGE INTO text (shared by the query and the bench
    * phase split — render is setup, the routed apply is the operation).
    */
  private[graft] def g5RenderSql(s: SparkSession, root: String): String = {
    PartitionedTarget.read(s, s"$root/t").createOrReplaceTempView("g5_tgt")
    s.read.parquet(s"$root/delta").createOrReplaceTempView("g5_src")
    MergeDebug.renderSql(
      SimpleMerge.into(s.table("g5_tgt"), "g5_tgt").using(s.table("g5_src"), "g5_src")
        .keys("li_key").deleteMode(DeleteMode.Ignore).plan,
      "g5_tgt", "g5_src")
  }

  /** m13/m14 partition spec: 64 range buckets of width 4096 on the key. */
  private val m13Spec = PartitionSpec(
    Seq("li_key"), 64, graft.pipeline.HashMode.Md5Portable, rangeShift = Some(12))

  private def m13Opts = MergeOptions(keys = Seq("li_key"), delete = DeleteMode.Ignore)

  /** Untimed fixture build for m13: range-bucketed target from the keyed
    * lineitem frame, plus the delta MATERIALIZED as its own small parquet
    * table — a real incremental batch arrives that way (CDC feed, landing
    * zone), whereas carving it from the 600k-row source table inside the
    * timed apply would bill a full lineitem scan to BOTH apply paths and
    * drown the pruning signal in shared fixture cost. Fresh scratch per
    * call — the apply mutates the target, so every bench iteration sets
    * up anew.
    */
  private[graft] def m13Setup(s: SparkSession, dir: String): String = {
    val root = Fixtures.scratchDir("graft-m13")
    PartitionedTarget.write(Fixtures.lineitemKeyed(s, dir), s"$root/t", m13Spec)
    Fixtures.lineitemKeyedDelta(s, dir).write.parquet(s"$root/delta")
    root
  }

  /** The operation m13 measures: one partition-scoped apply of the
    * materialized delta (touches 3 of 64 buckets).
    */
  private[graft] def m13Apply(s: SparkSession, root: String): Unit = {
    MergeApply.applyToPartitioned(s, s"$root/t", s.read.parquet(s"$root/delta"), m13Opts)
    ()
  }

  /** Untimed fixture build for m14: the same target content and
    * materialized delta as m13, target as plain parquet (the full-rewrite
    * path's shape).
    */
  private[graft] def m14Setup(s: SparkSession, dir: String): String = {
    val root = Fixtures.scratchDir("graft-m14")
    Fixtures.lineitemKeyed(s, dir).write.mode("overwrite").parquet(s"$root/t")
    Fixtures.lineitemKeyedDelta(s, dir).write.parquet(s"$root/delta")
    root
  }

  /** The operation m14 measures: the identical logical merge through the
    * full-rewrite apply (reads and rewrites the whole target).
    */
  private[graft] def m14Apply(s: SparkSession, root: String): Unit = {
    MergeApply.applyTo(s, s"$root/t", s.read.parquet(s"$root/delta"), m13Opts)
    ()
  }

  /** Shared affected/target/variance computation (m9 and m11). */
  private def varianceFrame(s: SparkSession, dir: String): DataFrame = {
    val m = ordersMerge(s, dir).delete("YES")
    val affected = m.audit.agg(count(lit(1)).as("affected_rows"))
    val targetRows = ordersTarget(s, dir).agg(count(lit(1)).as("target_rows"))
    affected.crossJoin(targetRows)
      .withColumn("variance_pct", round(col("affected_rows") * lit(100.0) / col("target_rows"), 6))
  }

  // ---- oracles ----

  private val ordersMergedSelect =
    mergedSelect(ordersCols, Set("o_orderkey"), ordersCols.toSet)

  /** Shared by m13 (partition-pruned) and m14 (full rewrite): one logical
    * keep-merge of the contiguous delta, bucket recomputed per row with
    * the range twin `(k >> 12) % 64` (keys are positive, so DuckDB's
    * signed `%` equals Spark's pmod here).
    */
  private val liCols = Seq("li_key", "l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate")

  private val partitionedMergeOracle: String =
    s"""${Fixtures.lineitemKeyedCtes}
       |SELECT ${mergedSelect(liCols, Set("li_key"), liCols.toSet)},
       |       (coalesce(s.li_key, t.li_key) >> 12) % 64 AS bucket
       |FROM (SELECT *, 1 AS __t_p FROM tgt) t
       |FULL OUTER JOIN (SELECT *, 1 AS __s_p FROM delta) s
       |  ON t.li_key = s.li_key
       |ORDER BY li_key""".stripMargin

  /** g3 executes m1's exact semantics from SQL text, so it shares m1's
    * oracle verbatim (the d9/d22 one-ground-truth precedent). Lazy:
    * `oracleSqlBase` is declared below. */
  lazy val oracleSql: Map[String, String] = oracleSqlBase ++ Map(
    "g3_merge_sql" -> oracleSqlBase("m1_merge_delete"),
    "g4_merge_sql_cte" -> oracleSqlBase("m6_merge_badkey"),
    // g5 executes m13's exact semantics from SQL text against the same
    // partitioned target — m13's oracle verbatim.
    "g5_merge_sql_partitioned" -> oracleSqlBase("m13_merge_partitioned"),
    // g6 executes m18's evolution merge from WITH SCHEMA EVOLUTION text
    // — m18's oracle verbatim.
    "g6_merge_sql_evolve" -> oracleSqlBase("m18_merge_evolve"))

  private val oracleSqlBase: Map[String, String] = Map(
    // m18: m2's keep-merge with the evolved column — source rows carry
    // the synthesized channel, target-only rows NULL (the evolved
    // target's typed-NULL history).
    "m18_merge_evolve" ->
      s"""WITH tgt AS (
         |  SELECT o_orderkey, o_custkey, o_orderstatus,
         |         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
         |         o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderkey % 10 <> 0
         |), src AS (
         |  SELECT *, 'ch' || CAST(o_orderkey % 4 AS VARCHAR) AS o_channel
         |  FROM orders WHERE o_orderkey % 7 <> 0
         |)
         |SELECT $ordersMergedSelect,
         |       CASE WHEN s.__s_p IS NOT NULL THEN s.o_channel ELSE NULL END AS o_channel
         |$ordersJoin
         |ORDER BY o_orderkey""".stripMargin,
    "m1_merge_delete" ->
      s"""$ordersCtes
         |SELECT $ordersMergedSelect
         |$ordersJoin
         |WHERE s.__s_p IS NOT NULL
         |ORDER BY o_orderkey""".stripMargin,
    "m2_merge_keep" ->
      s"""$ordersCtes
         |SELECT $ordersMergedSelect
         |$ordersJoin
         |ORDER BY o_orderkey""".stripMargin,
    "m3_merge_softdelete" ->
      s"""$ordersCtes
         |SELECT ${mergedSelect(ordersCols.filterNot(_ == "o_orderstatus"), Set("o_orderkey"), ordersCols.toSet)},
         |       CASE WHEN s.__s_p IS NOT NULL THEN s.o_orderstatus ELSE 'X' END AS o_orderstatus
         |$ordersJoin
         |ORDER BY o_orderkey""".stripMargin,
    "m4_merge_filtered" ->
      s"""$ordersCtes
         |SELECT * FROM src
         |UNION ALL
         |SELECT * FROM tgt WHERE NOT coalesce(o_orderdate >= '1998-01-01', FALSE)
         |ORDER BY ${ordersCols.mkString(", ")}""".stripMargin,
    "m5_merge_audit" ->
      s"""$ordersCtes
         |SELECT CASE WHEN t.__t_p IS NULL THEN 'INSERT'
         |            WHEN s.__s_p IS NULL THEN 'DELETE'
         |            ELSE 'UPDATE' END AS action,
         |       coalesce(t.o_orderkey, s.o_orderkey) AS o_orderkey,
         |       ${ordersPayload.map(c =>
                   s"t.$c AS d_$c,\n       CASE WHEN s.__s_p IS NULL THEN NULL ELSE s.$c END AS i_$c")
                   .mkString(",\n       ")}
         |$ordersJoin
         |WHERE t.__t_p IS NULL OR s.__s_p IS NULL OR NOT $ordersChangedPred
         |ORDER BY o_orderkey""".stripMargin,
    "m6_merge_badkey" ->
      """SELECT * FROM lineitem WHERE l_partkey % 5 <> 0
        |ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
        |         l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate""".stripMargin,
    "m12_merge_badkey_salted" ->
      """SELECT * FROM lineitem WHERE l_partkey % 5 <> 0
        |ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
        |         l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate""".stripMargin,
    "m7_merge_nullkey" ->
      s"""$customerCtes
         |SELECT CASE WHEN s.__s_p IS NOT NULL THEN s.c_custkey ELSE t.c_custkey END AS c_custkey,
         |       CASE WHEN s.__s_p IS NOT NULL THEN s.c_name ELSE t.c_name END AS c_name,
         |       CASE WHEN s.__s_p IS NOT NULL THEN s.c_nationkey ELSE t.c_nationkey END AS c_nationkey,
         |       CASE WHEN s.__s_p IS NOT NULL THEN s.c_acctbal ELSE t.c_acctbal END AS c_acctbal,
         |       CASE WHEN s.__s_p IS NOT NULL THEN s.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment
         |FROM (SELECT *, 1 AS __t_p FROM tgt) t
         |FULL OUTER JOIN (SELECT *, 1 AS __s_p FROM src) s
         |  ON t.c_custkey IS NOT DISTINCT FROM s.c_custkey
         |ORDER BY c_custkey NULLS FIRST""".stripMargin,
    "m8_merge_actions" ->
      s"""$ordersCtes
         |SELECT CASE WHEN t.__t_p IS NULL THEN 'INSERT'
         |            WHEN s.__s_p IS NULL THEN 'DELETE'
         |            ELSE 'UPDATE' END AS action,
         |       count(*) AS n
         |$ordersJoin
         |WHERE t.__t_p IS NULL OR s.__s_p IS NULL OR NOT $ordersChangedPred
         |GROUP BY 1
         |ORDER BY action""".stripMargin,
    "m9_merge_variance" ->
      s"""$ordersCtes
         |SELECT a.affected_rows, b.target_rows,
         |       round(a.affected_rows * 100.0 / b.target_rows, 6) AS variance_pct
         |FROM (
         |  SELECT count(*) AS affected_rows
         |  $ordersJoin
         |  WHERE t.__t_p IS NULL OR s.__s_p IS NULL OR NOT $ordersChangedPred
         |) a CROSS JOIN (SELECT count(*) AS target_rows FROM tgt) b""".stripMargin,
    "g1_debug_render" ->
      """SELECT TRUE AS has_merge_into, TRUE AS has_using, TRUE AS has_nullsafe_on,
        |       TRUE AS has_matched_distinct, CAST(5 AS BIGINT) AS n_update_assignments,
        |       TRUE AS has_insert_in_source_order, TRUE AS has_nmbs_delete,
        |       TRUE AS audit_ddl_prefix_ok, TRUE AS audit_d_block_first,
        |       '15%' AS threshold""".stripMargin,
    // m15: the feed reconstructed in SQL — D keys leave, U/I rows take
    // the source truth, untouched target rows (perturbed prices intact)
    // pass through.
    // m20: the three op classes replayed literally — anti joins for I/D,
    // a row-tuple IS DISTINCT FROM for U; D rows carry the OLD values.
    "m20_snapshot_diff" ->
      s"""$ordersCtes,
         |ins AS (
         |  SELECT 'I' AS op, s.* FROM src s
         |  WHERE NOT EXISTS (SELECT 1 FROM tgt t WHERE t.o_orderkey = s.o_orderkey)),
         |del AS (
         |  SELECT 'D' AS op, t.* FROM tgt t
         |  WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.o_orderkey = t.o_orderkey)),
         |upd AS (
         |  SELECT 'U' AS op, s.* FROM src s JOIN tgt t ON t.o_orderkey = s.o_orderkey
         |  WHERE (s.o_custkey, s.o_orderstatus, s.o_totalprice, s.o_orderdate, s.o_orderpriority)
         |        IS DISTINCT FROM
         |        (t.o_custkey, t.o_orderstatus, t.o_totalprice, t.o_orderdate, t.o_orderpriority))
         |SELECT * FROM ins UNION ALL SELECT * FROM del UNION ALL SELECT * FROM upd
         |ORDER BY o_orderkey""".stripMargin,
    "m15_cdc_apply" ->
      s"""$ordersCtes,
         |feed_keys AS (
         |  SELECT o_orderkey FROM tgt WHERE o_orderkey % 13 = 0
         |  UNION
         |  SELECT s.o_orderkey FROM src s JOIN tgt t USING (o_orderkey)
         |  WHERE s.o_orderkey % 13 <> 0
         |  UNION
         |  SELECT s.o_orderkey FROM src s
         |  WHERE s.o_orderkey NOT IN (SELECT o_orderkey FROM tgt)
         |)
         |SELECT * FROM tgt WHERE o_orderkey NOT IN (SELECT o_orderkey FROM feed_keys)
         |UNION ALL
         |SELECT s.* FROM src s JOIN tgt t USING (o_orderkey) WHERE s.o_orderkey % 13 <> 0
         |UNION ALL
         |SELECT s.* FROM src s WHERE s.o_orderkey NOT IN (SELECT o_orderkey FROM tgt)
         |ORDER BY o_orderkey""".stripMargin,
    // m17: the SCD2 round-trip law — snapshotAt(0) == the pre-merge
    // target, snapshotAt(1) == the applied source snapshot, verbatim.
    "m17_scd2_snapshot" ->
      s"""$ordersCtes
         |SELECT * FROM (
         |  SELECT *, CAST(0 AS BIGINT) AS as_of_v FROM tgt
         |  UNION ALL
         |  SELECT *, CAST(1 AS BIGINT) AS as_of_v FROM src
         |)
         |ORDER BY as_of_v, o_orderkey""".stripMargin,
    // m19: the PIT join replayed literally — the same planted two-version
    // history, each event matched to the interval covering its own
    // timestamp.
    "m19_pit_enrich" ->
      """WITH b AS (
        |  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events
        |), hist AS (
        |  SELECT c_custkey, c_mktsegment AS seg,
        |         CAST(0 AS BIGINT) AS valid_from,
        |         (SELECT mid FROM b) AS valid_to
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment || '_2',
        |         (SELECT mid FROM b), CAST(NULL AS BIGINT)
        |  FROM customer
        |)
        |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us, h.seg
        |FROM events e JOIN hist h ON e.user_id = h.c_custkey
        | AND epoch_us(e.ts) >= h.valid_from
        | AND (h.valid_to IS NULL OR epoch_us(e.ts) < h.valid_to)
        |ORDER BY event_id""".stripMargin,
    // m16: the five SCD2 dispositions spelled out as UNION ALL branches —
    // history pass-through, unchanged current, changed key closed+reopened,
    // departed key closed, new key opened. Same change predicate as the
    // A10 struct comparison.
    "m16_scd2_history" ->
      s"""$ordersCtes,
         |hist AS (
         |  SELECT o_orderkey, o_custkey, o_orderstatus,
         |         o_totalprice - 5.0 AS o_totalprice, o_orderdate, o_orderpriority,
         |         CAST(-1 AS BIGINT) AS valid_from, CAST(0 AS BIGINT) AS valid_to,
         |         FALSE AS is_current
         |  FROM tgt WHERE o_orderkey % 7 = 0
         |)
         |SELECT * FROM hist
         |UNION ALL
         |SELECT t.*, CAST(0 AS BIGINT), CAST(NULL AS BIGINT), TRUE
         |FROM tgt t JOIN src s ON t.o_orderkey = s.o_orderkey
         |WHERE $ordersChangedPred
         |UNION ALL
         |SELECT t.*, CAST(0 AS BIGINT), CAST(1 AS BIGINT), FALSE
         |FROM tgt t JOIN src s ON t.o_orderkey = s.o_orderkey
         |WHERE NOT $ordersChangedPred
         |UNION ALL
         |SELECT s.*, CAST(1 AS BIGINT), CAST(NULL AS BIGINT), TRUE
         |FROM tgt t JOIN src s ON t.o_orderkey = s.o_orderkey
         |WHERE NOT $ordersChangedPred
         |UNION ALL
         |SELECT t.*, CAST(0 AS BIGINT), CAST(1 AS BIGINT), FALSE
         |FROM tgt t WHERE t.o_orderkey NOT IN (SELECT o_orderkey FROM src)
         |UNION ALL
         |SELECT s.*, CAST(1 AS BIGINT), CAST(NULL AS BIGINT), TRUE
         |FROM src s WHERE s.o_orderkey NOT IN (SELECT o_orderkey FROM tgt)
         |ORDER BY o_orderkey, valid_from, is_current""".stripMargin,
    "g2_debug_render_hard" ->
      """SELECT TRUE AS has_badkey_target_cte, TRUE AS has_badkey_source_cte,
        |       TRUE AS on_composite_nullsafe, TRUE AS has_rn_tiebreak,
        |       CAST(4 AS BIGINT) AS n_update_assignments,
        |       TRUE AS has_soft_delete_set, TRUE AS audit_ddl_composite_keys,
        |       '15%' AS threshold""".stripMargin,
    "m11_threshold_verdict" ->
      s"""$ordersCtes
         |SELECT a.affected_rows, b.target_rows,
         |       round(a.affected_rows * 100.0 / b.target_rows, 6) AS variance_pct,
         |       a.affected_rows * 100.0 / b.target_rows <= 1.0 AS would_commit
         |FROM (
         |  SELECT count(*) AS affected_rows
         |  $ordersJoin
         |  WHERE t.__t_p IS NULL OR s.__s_p IS NULL OR NOT $ordersChangedPred
         |) a CROSS JOIN (SELECT count(*) AS target_rows FROM tgt) b""".stripMargin,
    "m13_merge_partitioned" -> partitionedMergeOracle,
    "m14_merge_full_rewrite" -> partitionedMergeOracle,
    "m10_merge_subset_source" ->
      s"""$ordersCtes
         |, src5 AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate FROM src)
         |SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey,
         |       CASE WHEN s.__s_p IS NOT NULL THEN s.o_custkey ELSE t.o_custkey END AS o_custkey,
         |       CASE WHEN s.__s_p IS NOT NULL THEN s.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
         |       CASE WHEN s.__s_p IS NOT NULL THEN s.o_totalprice ELSE t.o_totalprice END AS o_totalprice,
         |       CASE WHEN s.__s_p IS NOT NULL THEN s.o_orderdate ELSE t.o_orderdate END AS o_orderdate,
         |       t.o_orderpriority AS o_orderpriority
         |FROM (SELECT *, 1 AS __t_p FROM tgt) t
         |FULL OUTER JOIN (SELECT *, 1 AS __s_p FROM src5) s
         |  ON t.o_orderkey = s.o_orderkey
         |ORDER BY o_orderkey""".stripMargin
  )
}
