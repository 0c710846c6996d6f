package graft.merge

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import graft.GraftSuite

/** Apply-path specs: threshold guard / abort (A22), percent parse (A23),
  * lastUpdate stamp (A24), empty-target bypass (sp_SimpleMerge.sql:473-476),
  * audit persistence (`@output`, :350-410), and the single-execution
  * guarantee of the staged apply.
  */
class MergeApplySpec extends GraftSuite {
  import spark.implicits._

  private def freshDir(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("t").toString

  private def writeTarget(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  private def target3: DataFrame =
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "name", "v")

  private def opts(threshold: Option[String] = None, audit: Boolean = false) =
    MergeOptions(keys = Seq("k"), threshold = threshold, audit = audit)

  test("commit path: result replaces target, counts and stamp correct (A21, A24)") {
    val path = freshDir("apply-commit")
    writeTarget(target3, path)
    // update k=2, insert k=4, delete k=3
    val source = Seq((1L, "a", 10.0), (2L, "B", 21.0), (4L, "d", 40.0)).toDF("k", "name", "v")
    val r = MergeApply.applyTo(spark, path, source, opts())
    assert(r.committed && r.affectedRows === 3L && r.targetRows === 3L)
    assert(math.abs(r.variancePct - 100.0) < 1e-9)
    val after = spark.read.parquet(path).as[(Long, String, Double)].collect().toSet
    assert(after === Set((1L, "a", 10.0), (2L, "B", 21.0), (4L, "d", 40.0)))
    assert(MergeApply.lastUpdate(spark, path).isDefined)
  }

  test("threshold abort: target untouched, no stamp, no staging leak (A22)") {
    val path = freshDir("apply-abort")
    writeTarget(target3, path)
    val source = Seq((1L, "a", 10.0), (2L, "B", 21.0), (4L, "d", 40.0)).toDF("k", "name", "v")
    val before = spark.read.parquet(path).collect().toSet
    val e = intercept[MergeThresholdExceededException] {
      MergeApply.applyTo(spark, path, source, opts(threshold = Some("50%")))
    }
    assert(math.abs(e.variancePct - 100.0) < 1e-9 && e.thresholdPct === 50.0)
    assert(spark.read.parquet(path).collect().toSet === before)
    assert(MergeApply.lastUpdate(spark, path).isEmpty)
    // No leftover staging/work/retired siblings.
    val parent = Paths.get(path).getParent
    val leaks = Files.list(parent).toArray.map(_.toString).filter(_.contains(".t."))
    assert(leaks.isEmpty, s"leaked: ${leaks.mkString(",")}")
  }

  test("variance within threshold commits; exact boundary is inclusive (A22)") {
    val path = freshDir("apply-within")
    writeTarget(target3, path)
    // one change out of three rows = 33.33% <= 34%
    val source = Seq((1L, "a", 10.0), (2L, "B", 21.0), (3L, "c", 30.0)).toDF("k", "name", "v")
    val r = MergeApply.applyTo(spark, path, source, opts(threshold = Some("34%")))
    assert(r.committed && r.affectedRows === 1L)
  }

  test("empty-target bypass: threshold ignored when target has no rows (sql:473-476)") {
    val path = freshDir("apply-empty")
    writeTarget(target3.filter($"k" < 0), path)
    val source = Seq((1L, "a", 10.0)).toDF("k", "name", "v")
    val r = MergeApply.applyTo(spark, path, source, opts(threshold = Some("0.001%")))
    assert(r.committed && r.targetRows === 0L && r.variancePct.isNaN)
    assert(spark.read.parquet(path).count() === 1L)
  }

  test("invalid threshold string rejected before any data movement (A23)") {
    val path = freshDir("apply-badthresh")
    writeTarget(target3, path)
    intercept[MergeValidationException] {
      MergeApply.applyTo(spark, path, target3, opts(threshold = Some("lots%")))
    }
    assert(spark.read.parquet(path).count() === 3L)
  }

  test("audit persistence: affected rows appended with d_*/i_* blocks (@output)") {
    val path = freshDir("apply-audit")
    writeTarget(target3, path)
    val source = Seq((1L, "a", 10.0), (2L, "B", 21.0), (4L, "d", 40.0)).toDF("k", "name", "v")
    val r = MergeApply.applyTo(spark, path, source, opts(audit = true))
    assert(r.auditPath === Some(MergeApply.defaultAuditPath(path)))
    val audit = spark.read.parquet(r.auditPath.get)
    assert(audit.count() === r.affectedRows)
    assert(audit.columns.toSeq === Seq("actionTime", "action", "k", "d_name", "d_v", "i_name", "i_v"))
    val byAction = audit.collect().map(r => r.getAs[String]("action") -> r).toMap
    assert(byAction("DELETE").getAs[String]("d_name") === "c")
    assert(byAction("DELETE").getAs[String]("i_name") === null) // inserted.* NULL on delete
    assert(byAction("INSERT").getAs[String]("d_name") === null) // deleted.* NULL on insert
    assert(byAction("UPDATE").getAs[String]("d_name") === "b")
    assert(byAction("UPDATE").getAs[String]("i_name") === "B")
    // A no-op re-merge appends zero audit rows.
    val r2 = MergeApply.applyTo(spark, path, source, opts(audit = true))
    assert(r2.affectedRows === 0L)
    assert(spark.read.parquet(r.auditPath.get).count() === r.affectedRows)
  }

  test("audit suppressed on threshold abort (OUTPUT rolls back with the txn)") {
    val path = freshDir("apply-audit-abort")
    writeTarget(target3, path)
    val source = Seq((9L, "z", 90.0)).toDF("k", "name", "v")
    intercept[MergeThresholdExceededException] {
      MergeApply.applyTo(spark, path, source, opts(threshold = Some("1%"), audit = true))
    }
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(MergeApply.defaultAuditPath(path))))
  }

  test("subset source: audit images cover target-only columns (ADVICE r1 #1)") {
    val path = freshDir("apply-subset-audit")
    writeTarget(target3, path)
    // Source lacks the `v` column (m10 shape): images must still carry d_v/i_v.
    val source = Seq((2L, "B"), (4L, "d")).toDF("k", "name")
    val r = MergeApply.applyTo(spark, path, source,
      MergeOptions(keys = Seq("k"), delete = DeleteMode.Ignore, audit = true))
    val audit = spark.read.parquet(r.auditPath.get)
    assert(audit.columns.toSeq === Seq("actionTime", "action", "k", "d_name", "d_v", "i_name", "i_v"))
    val byAction = audit.collect().map(r => r.getAs[String]("action") -> r).toMap
    // UPDATE: target-only column v preserved — post-image equals pre-image.
    assert(byAction("UPDATE").getAs[Double]("d_v") === 20.0)
    assert(byAction("UPDATE").getAs[Double]("i_v") === 20.0)
    // INSERT: no pre-image; post-image of the target-only column is NULL.
    assert(byAction("INSERT").isNullAt(byAction("INSERT").fieldIndex("d_v")))
    assert(byAction("INSERT").isNullAt(byAction("INSERT").fieldIndex("i_v")))
  }

  test("salted badKey rank: 1..n permutation per key, multiset == plain window") {
    // Heavily skewed: one hot key with 40 rows, plus normal keys.
    val hot = (1 to 40).map(i => (7L, s"h$i", i.toDouble))
    val rest = Seq((1L, "a", 1.0), (2L, "b", 2.0), (2L, "b2", 3.0))
    val target = (hot ++ rest).toDF("k", "name", "v")
    val source = (hot.map { case (k, n, v) => (k, n + "'", v + 0.5) } ++ rest).toDF("k", "name", "v")
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, String, Double)].collect().sortBy(_.toString).toSeq
    val plain = SimpleMerge.into(target).using(source).keys("k").badKey(true).delete("YES").merged
    val salted = SimpleMerge.into(target).using(source).keys("k").badKeySalt(5).delete("YES").merged
    assert(sorted(salted) === sorted(source.toDF()))
    assert(sorted(salted) === sorted(plain))
  }

  test("a source column named 'present' survives the merge (marker collision)") {
    val t = Seq((1L, "old", "x")).toDF("k", "present", "other")
    val s = Seq((1L, "new", "x"), (2L, "p2", "y")).toDF("k", "present", "other")
    val got = SimpleMerge.into(t).using(s).keys("k").delete("YES")
      .merged.as[(Long, String, String)].collect().toSet
    assert(got === Set((1L, "new", "x"), (2L, "p2", "y")))
  }

  test("soft-delete SET evaluates all RHS against the pre-update image (a=b,b=a swaps)") {
    val t = Seq((1L, "A", "B"), (2L, "keep", "keep2")).toDF("k", "a", "b")
    val s = Seq((2L, "keep", "keep2")).toDF("k", "a", "b")
    val got = SimpleMerge.into(t).using(s).keys("k")
      .delete("set a = b, b = a")
      .merged.as[(Long, String, String)].collect().toSet
    assert(got === Set((1L, "B", "A"), (2L, "keep", "keep2"))) // swapped, not b,b
  }

  test("SET with bracket identifiers parses like targetFilter does") {
    val t = Seq((1L, "live"), (2L, "live")).toDF("k", "status")
    val s = Seq((1L, "live")).toDF("k", "status")
    val got = SimpleMerge.into(t).using(s).keys("k")
      .delete("set [status] = concat('was-', [status])")
      .merged.as[(Long, String)].collect().toSet
    assert(got === Set((1L, "live"), (2L, "was-live")))
  }

  test("type gates: safe upcast allowed and target type preserved; narrowing rejected") {
    val t = Seq((1L, 10L)).toDF("k", "v") // v: bigint
    val sInt = Seq((1L, 11), (2L, 12)).toDF("k", "v") // v: int — upcasts
    val merged = SimpleMerge.into(t).using(sInt).keys("k").delete("NO").merged
    assert(merged.schema("v").dataType === org.apache.spark.sql.types.LongType)
    assert(merged.as[(Long, Long)].collect().toSet === Set((1L, 11L), (2L, 12L)))

    val tInt = Seq((1, 10)).toDF("k", "v")
    val sStr = Seq((1, "x")).toDF("k", "v") // string -> int: rejected
    val e = intercept[MergeValidationException] {
      SimpleMerge.into(tInt).using(sStr).keys("k").merged
    }
    assert(e.getMessage.contains("not compatible"))
  }

  test("reserved __graft_ column prefix is rejected") {
    val bad = Seq((1L, "x")).toDF("k", "__graft_action")
    intercept[MergeValidationException] {
      SimpleMerge.into(bad).using(bad).keys("k").merged
    }
  }

  test("duplicate-key guard restores the reference's fail-fast (opt-in)") {
    val dupTarget = Seq((1L, "a", 1.0), (1L, "a2", 2.0), (2L, "b", 3.0)).toDF("k", "name", "v")
    val source = Seq((1L, "a3", 4.0)).toDF("k", "name", "v")
    val m = SimpleMerge.into(dupTarget).using(source).keys("k")
    val e = intercept[MergeValidationException] { m.assertUniqueKeys() }
    assert(e.getMessage.contains("1 target / 0 source"))
    // badKey=true makes duplicates legal — guard is a no-op.
    SimpleMerge.into(dupTarget).using(source).keys("k").badKey(true).assertUniqueKeys()
  }

  test("audit-off apply executes the join exactly once (scale guarantee)") {
    val path = freshDir("apply-once")
    writeTarget(target3, path)
    val source = Seq((2L, "B", 21.0), (4L, "d", 40.0)).toDF("k", "name", "v")
    val joins = new AtomicInteger(0)
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        if (qe.executedPlan.toString.contains("Join")) joins.incrementAndGet()
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      MergeApply.applyTo(spark, path, source, opts(threshold = Some("500%")))
      // Listener delivery is async; wait for the first event, then settle.
      val deadline = System.nanoTime() + 5.seconds.toNanos
      while (joins.get() < 1 && System.nanoTime() < deadline) Thread.sleep(50)
      Thread.sleep(500) // catch any late double-execution event
      assert(joins.get() === 1, s"expected exactly one join-bearing execution, saw ${joins.get()}")
    } finally spark.listenerManager.unregister(listener)
  }

  private implicit class IntSeconds(n: Int) {
    def seconds: scala.concurrent.duration.FiniteDuration = scala.concurrent.duration.Duration(n, "s")
  }
}
