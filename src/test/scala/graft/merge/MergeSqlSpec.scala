package graft.merge

import org.apache.spark.sql.functions._
import graft.GraftSuite

/** MergeSql: MERGE INTO text → parsed plan → SimpleMerge round trip (the
  * B10 execute boundary). Every mode must execute to the same frame the
  * API form produces, and off-contract statements must be rejected with
  * the engine's validation channel, never silently reinterpreted.
  */
class MergeSqlSpec extends GraftSuite {
  import spark.implicits._

  private lazy val tgt = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "name", "amt")
  private lazy val src = Seq(
    (2L, "b2", 21.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "name", "amt")

  private def viewed[T](f: => T): T = {
    tgt.createOrReplaceTempView("ms_tgt")
    src.createOrReplaceTempView("ms_src")
    f
  }

  private def collectMerged(sql: String): Set[(Long, String, Double)] =
    viewed(MergeSql.mergedFrame(spark, sql).as[(Long, String, Double)].collect().toSet)

  test("rendered MERGE text round-trips: parse + execute == API merged frame, all delete modes") {
    for (mode <- Seq("YES", "NO", "set name = 'GONE'")) {
      val api = viewed {
        SimpleMerge.into(tgt, "ms_tgt").using(src, "ms_src").keys("k").delete(mode)
      }
      val sql = MergeDebug.renderSql(api.plan, "ms_tgt", "ms_src")
      val viaSql = collectMerged(sql)
      val viaApi = api.merged.as[(Long, String, Double)].collect().toSet
      assert(viaSql === viaApi, s"mode=$mode\n$sql")
    }
  }

  test("CTE-wrapped renders round-trip: targetFilter, badKey, and both together") {
    val dupSrc = Seq(
      (2L, "b2", 21.0), (2L, "b3", 22.0), (3L, "c", 30.0), (4L, "d", 40.0)
    ).toDF("k", "name", "amt")
    val variants: Seq[SimpleMerge => SimpleMerge] = Seq(
      _.targetFilter("amt > 15"),
      _.badKey(true),
      m => m.targetFilter("amt > 15").badKey(true))
    for ((tweak, i) <- variants.zipWithIndex) {
      tgt.createOrReplaceTempView("ms_tgt")
      dupSrc.createOrReplaceTempView("ms_src")
      val api = tweak(SimpleMerge.into(tgt, "ms_tgt").using(dupSrc, "ms_src").keys("k").delete("YES"))
      val sql = MergeDebug.renderSql(api.plan, "ms_tgt", "ms_src")
      assert(sql.startsWith("WITH"), s"variant $i should render a CTE\n$sql")
      val viaSql = MergeSql.mergedFrame(spark, sql).as[(Long, String, Double)].collect().toSet
      val viaApi = api.merged.as[(Long, String, Double)].collect().toSet
      assert(viaSql === viaApi, s"variant $i\n$sql")
    }
  }

  test("off-grammar CTE shapes are rejected, not silently degraded") {
    def rejected(sql: String, needle: String): Unit = {
      val e = intercept[MergeValidationException](viewed(MergeSql.toSimpleMerge(spark, sql)))
      assert(e.getMessage.contains(needle), s"$sql\n→ ${e.getMessage}")
    }
    // A CTE carrying semantics outside the render grammar (aggregation).
    rejected(
      """WITH target AS (SELECT k, name, max(amt) AS amt FROM ms_tgt GROUP BY k, name)
        |MERGE INTO target t USING ms_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""".stripMargin, "CTE")
    // A filtered SOURCE is not a render the engine produces.
    rejected(
      """WITH source AS (SELECT * FROM ms_src WHERE amt > 30)
        |MERGE INTO ms_tgt t USING source s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""".stripMargin,
      "SOURCE CTE")
    // The rn tiebreak without the windows (or vice versa) is inconsistent.
    rejected(
      """WITH target AS (SELECT * FROM ms_tgt WHERE amt > 5)
        |MERGE INTO target t USING ms_src s ON t.k = s.k AND t._SimpleMerge_rn = s._SimpleMerge_rn
        |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""".stripMargin,
      "dedup shape")
    // A window partitioned by something other than the merge keys.
    rejected(
      """WITH target AS (SELECT *, row_number() OVER (PARTITION BY name ORDER BY monotonically_increasing_id()) AS _SimpleMerge_rn FROM (SELECT * FROM ms_tgt)),
        |     source AS (SELECT *, row_number() OVER (PARTITION BY name ORDER BY monotonically_increasing_id()) AS _SimpleMerge_rn FROM (SELECT * FROM ms_src))
        |MERGE INTO target t USING source s ON t.k = s.k AND t._SimpleMerge_rn = s._SimpleMerge_rn
        |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""".stripMargin,
      "partitioned by")
    // An unreferenced CTE.
    rejected(
      """WITH extra AS (SELECT * FROM ms_tgt)
        |MERGE INTO ms_tgt t USING ms_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""".stripMargin,
      "not referenced")
  }

  test("hand-written MERGE dialects parse: UPDATE SET *, INSERT *, unguarded update, plain =") {
    val got = collectMerged(
      """MERGE INTO ms_tgt t USING ms_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    assert(got === Set((2L, "b2", 21.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("soft delete from SQL text applies the SET to unmatched target rows") {
    val got = collectMerged(
      """MERGE INTO ms_tgt t USING ms_src s ON t.k <=> s.k
        |WHEN MATCHED THEN UPDATE SET t.name = s.name, t.amt = s.amt
        |WHEN NOT MATCHED THEN INSERT (k, name, amt) VALUES (s.k, s.name, s.amt)
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET t.name = 'GONE'""".stripMargin)
    assert(got === Set((1L, "GONE", 10.0), (2L, "b2", 21.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("off-contract statements are rejected, not reinterpreted") {
    def rejected(sql: String, needle: String): Unit = {
      val e = intercept[MergeValidationException](viewed(MergeSql.toSimpleMerge(spark, sql)))
      assert(e.getMessage.contains(needle), s"$sql\n→ ${e.getMessage}")
    }
    // Partial SET changes semantics the engine doesn't implement.
    rejected(
      """MERGE INTO ms_tgt t USING ms_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET t.name = s.amt
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin, "SET")
    // A LEGAL partial SET (identity assignment, but not the full update
    // set): SQL semantics would leave name untouched; the engine would
    // update all shared non-key columns. Rejected, not reinterpreted.
    rejected(
      """MERGE INTO ms_tgt t USING ms_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET t.amt = s.amt
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin, "partial SET")
    // A legal partial INSERT: SQL semantics would insert NULL name; the
    // engine inserts every source column.
    rejected(
      """MERGE INTO ms_tgt t USING ms_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT (k, amt) VALUES (s.k, s.amt)""".stripMargin, "partial INSERT")
    // A single-column change guard: "update only when amt changed" is not
    // the engine's all-column change detection.
    rejected(
      """MERGE INTO ms_tgt t USING ms_src s ON t.k = s.k
        |WHEN MATCHED AND t.amt IS DISTINCT FROM s.amt THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin, "change-guard")
    // A full-row struct guard over the WRONG column set (keys included).
    rejected(
      """MERGE INTO ms_tgt t USING ms_src s ON t.k = s.k
        |WHEN MATCHED AND struct(s.k, s.name, s.amt) IS DISTINCT FROM struct(t.k, t.name, t.amt)
        |THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin, "change guard")
    // Cross-column ON is not a merge key.
    rejected(
      """MERGE INTO ms_tgt t USING ms_src s ON t.k = s.amt
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin, "different columns")
    // Non-equi ON term.
    rejected(
      """MERGE INTO ms_tgt t USING ms_src s ON t.k < s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin, "ON term")
    // Conditional matched guard that is not the change-detect idiom.
    rejected(
      """MERGE INTO ms_tgt t USING ms_src s ON t.k = s.k
        |WHEN MATCHED AND t.amt > 5 THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin, "WHEN MATCHED condition")
    // Not a MERGE at all.
    rejected("SELECT 1", "Not an executable MERGE INTO")
  }

  test("composite null-safe keys from SQL text match the API form") {
    val t2 = Seq((Some(1L), "x", 1.0), (None, "n", 2.0)).toDF("k", "name", "amt")
    val s2 = Seq((Some(1L), "x2", 1.5), (None, "n2", 2.5)).toDF("k", "name", "amt")
    t2.createOrReplaceTempView("ms_tgt2")
    s2.createOrReplaceTempView("ms_src2")
    val got = MergeSql.mergedFrame(spark,
      """MERGE INTO ms_tgt2 t USING ms_src2 s ON t.k <=> s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      .as[(Option[Long], String, Double)].collect().toSet
    // The NULL key matches null-safely: updated, not delete+insert.
    assert(got === Set((Some(1L), "x2", 1.5), (None, "n2", 2.5)))
  }

  test("WITH SCHEMA EVOLUTION: SQL == evolve+API merge; without the keyword the widened source rejects; path apply rewrites evolved") {
    val widened = src.withColumn("tier", concat(lit("T"), $"k"))
    tgt.createOrReplaceTempView("mse_tgt")
    widened.createOrReplaceTempView("mse_src")
    val evolveSql =
      """MERGE WITH SCHEMA EVOLUTION INTO mse_tgt t USING mse_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin
    val viaSql = MergeSql.mergedFrame(spark, evolveSql)
      .as[(Long, String, Double, Option[String])].collect().toSet
    val viaApi = SimpleMerge
      .into(SimpleMerge.evolveTarget(tgt, widened), "mse_tgt").using(widened, "mse_src")
      .keys("k").deleteMode(DeleteMode.Ignore)
      .merged.as[(Long, String, Double, Option[String])].collect().toSet
    assert(viaSql === viaApi)
    assert(viaSql.exists(_._4.contains("T2")) && viaSql.exists(_._4.isEmpty))
    // Same statement WITHOUT the keyword: the alignment gate still
    // rejects a widened source — evolution stays an explicit decision.
    intercept[MergeValidationException] {
      MergeSql.mergedFrame(spark, evolveSql.replace("MERGE WITH SCHEMA EVOLUTION", "MERGE"))
        .collect()
    }
    // On-disk route: the rewritten target carries the evolved column.
    val path = java.nio.file.Files.createTempDirectory("msql-evolve").resolve("t").toString
    tgt.write.parquet(path)
    val r = MergeSql.applyToTarget(spark, evolveSql, path)
    assert(r.committed)
    val after = spark.read.parquet(path)
    assert(after.columns.contains("tier"))
    assert(after.as[(Long, String, Double, Option[String])].collect().toSet === viaApi)
    // A partitioned target refuses evolution (mixed-schema buckets),
    // never half-applies.
    val ppath = java.nio.file.Files.createTempDirectory("msql-evolve-p").resolve("t").toString
    PartitionedTarget.write(tgt, ppath,
      PartitionSpec(Seq("k"), 4, graft.pipeline.HashMode.Xxhash64))
    val before = spark.read.parquet(ppath).count()
    intercept[MergeValidationException] {
      MergeSql.applyToTarget(spark, evolveSql, ppath)
    }
    assert(spark.read.parquet(ppath).count() === before)
  }

  test("applyToTarget routes a partitioned target into the pruned apply; untouched buckets physically untouched") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val spec = PartitionSpec(Seq("k"), 16, graft.pipeline.HashMode.Xxhash64)
    val path = Files.createTempDirectory("msql-part").resolve("t").toString
    val target = (0L until 60L).map(i => (i, s"n$i", i * 1.0)).toDF("k", "name", "amt")
    PartitionedTarget.write(target, path, spec)
    def snapshot(): Map[String, (Long, Long)] = {
      val base = Paths.get(path)
      Files.walk(base).iterator().asScala
        .filter(p => Files.isRegularFile(p))
        .filter(p => base.relativize(p).toString.contains(PartitionedTarget.BucketCol + "="))
        .map(p => base.relativize(p).toString ->
          (Files.getLastModifiedTime(p).toMillis, Files.size(p)))
        .toMap
    }
    val before = snapshot()
    val source = Seq((5L, "N5", 500.0), (1000L, "new", 1.0)).toDF("k", "name", "amt")
    val touched = Seq(5L, 1000L).toDF("k")
      .select(spec.bucket(Seq(col("k")))).as[Int].collect().toSet
    PartitionedTarget.read(spark, path).createOrReplaceTempView("msql_tgt")
    source.createOrReplaceTempView("msql_src")
    val sql = MergeDebug.renderSql(
      SimpleMerge.into(spark.table("msql_tgt"), "msql_tgt")
        .using(source, "msql_src").keys("k").deleteMode(DeleteMode.Ignore).plan,
      "msql_tgt", "msql_src")
    val r = MergeSql.applyToTarget(spark, sql, path)
    assert(r.committed && r.affectedRows === 2L)
    // Logical content: keep-merge of the delta.
    val got = PartitionedTarget.read(spark, path).as[(Long, String, Double)].collect().toSet
    val expected = (0L until 60L).map {
      case 5L => (5L, "N5", 500.0)
      case i => (i, s"n$i", i * 1.0)
    }.toSet + ((1000L, "new", 1.0))
    assert(got === expected)
    // Pruning pin: files outside the touched buckets are byte-identical
    // (path + mtime + length) — the SQL entry point inherited the
    // partition-scoped apply, not the full rewrite.
    def bucketOf(rel: String): Int =
      rel.split('/').find(_.startsWith(PartitionedTarget.BucketCol + "="))
        .map(_.split('=')(1).toInt).get
    val after = snapshot()
    assert(before.filter { case (p, _) => !touched.contains(bucketOf(p)) } ===
      after.filter { case (p, _) => !touched.contains(bucketOf(p)) })
    assert(before.keySet.filter(p => touched.contains(bucketOf(p)))
      .forall(p => !after.contains(p) || after(p) != before(p)))
    // A plain-parquet path (no sidecar) takes the full-rewrite apply.
    val flat = Files.createTempDirectory("msql-flat").resolve("t").toString
    target.write.parquet(flat)
    target.createOrReplaceTempView("msql_tgt")
    val r2 = MergeSql.applyToTarget(spark, sql, flat)
    assert(r2.committed)
    assert(spark.read.parquet(flat).as[(Long, String, Double)].collect().toSet === expected)
  }
}
