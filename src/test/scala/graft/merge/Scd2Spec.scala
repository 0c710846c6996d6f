package graft.merge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSuite

/** SCD Type-2 specs: the five dispositions, history pass-through,
  * idempotence of re-applying an identical snapshot, and version chaining
  * across successive applies (closed.valid_to == successor.valid_from).
  */
class Scd2Spec extends GraftSuite {
  import spark.implicits._

  private def cur(rows: (Long, String, Double)*): DataFrame =
    rows.toDF("k", "name", "v")
      .withColumn("valid_from", lit(0L))
      .withColumn("valid_to", lit(null).cast("bigint"))
      .withColumn("is_current", lit(true))

  private def collectRows(df: DataFrame) =
    df.select("k", "name", "v", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3), if (r.isNullAt(4)) -99L else r.getLong(4), r.getBoolean(5)))
      .toSet

  test("dispositions: unchanged / changed / departed / new, one pass") {
    val target = cur((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    val snap = Seq((1L, "a", 10.0), (2L, "b", 21.0), (4L, "d", 40.0)).toDF("k", "name", "v")
    val out = Scd2.apply(target, snap, Seq("k"), version = 7L)
    assert(collectRows(out) === Set(
      (1L, "a", 10.0, 0L, -99L, true),   // unchanged
      (2L, "b", 20.0, 0L, 7L, false),    // changed: closed
      (2L, "b", 21.0, 7L, -99L, true),   // changed: reopened
      (3L, "c", 30.0, 0L, 7L, false),    // departed: closed
      (4L, "d", 40.0, 7L, -99L, true)))  // new
  }

  test("closeMissing=false keeps departed keys current (delete-NO twin)") {
    val target = cur((1L, "a", 10.0), (3L, "c", 30.0))
    val snap = Seq((1L, "a", 10.0)).toDF("k", "name", "v")
    val out = Scd2.apply(target, snap, Seq("k"), version = 2L, closeMissing = false)
    assert(collectRows(out) === Set(
      (1L, "a", 10.0, 0L, -99L, true),
      (3L, "c", 30.0, 0L, -99L, true)))
  }

  test("closed history passes through untouched and never re-matches") {
    val history = Seq((1L, "old", 9.0)).toDF("k", "name", "v")
      .withColumn("valid_from", lit(-1L))
      .withColumn("valid_to", lit(0L))
      .withColumn("is_current", lit(false))
    val target = history.unionByName(cur((1L, "a", 10.0)))
    // snapshot matches the HISTORICAL payload — must still read as a
    // change against the CURRENT row, not a match against history
    val snap = Seq((1L, "old", 9.0)).toDF("k", "name", "v")
    val out = Scd2.apply(target, snap, Seq("k"), version = 5L)
    assert(collectRows(out) === Set(
      (1L, "old", 9.0, -1L, 0L, false),  // history untouched
      (1L, "a", 10.0, 0L, 5L, false),    // current closed
      (1L, "old", 9.0, 5L, -99L, true))) // snapshot reopened
  }

  test("re-applying the identical snapshot is a no-op (idempotence)") {
    val target = cur((1L, "a", 10.0), (2L, "b", 20.0))
    val snap = Seq((1L, "a", 10.0), (2L, "b", 21.0)).toDF("k", "name", "v")
    val v1 = Scd2.apply(target, snap, Seq("k"), version = 1L)
    val v2 = Scd2.apply(v1, snap, Seq("k"), version = 2L)
    assert(collectRows(v2) === collectRows(v1))
  }

  test("version chaining: each closed row's valid_to is its successor's valid_from") {
    val target = cur((1L, "a", 10.0))
    val s1 = Seq((1L, "a", 11.0)).toDF("k", "name", "v")
    val s2 = Seq((1L, "a", 12.0)).toDF("k", "name", "v")
    val out = Scd2.apply(Scd2.apply(target, s1, Seq("k"), 1L), s2, Seq("k"), 2L)
    val rows = collectRows(out)
    assert(rows === Set(
      (1L, "a", 10.0, 0L, 1L, false),
      (1L, "a", 11.0, 1L, 2L, false),
      (1L, "a", 12.0, 2L, -99L, true)))
    // exactly one current row per key, intervals contiguous
    assert(rows.count(_._6) === 1)
  }

  test("snapshotAt reconstructs every version boundary of a 3-version history") {
    val v0 = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "v")
      .withColumn("valid_from", lit(0L))
      .withColumn("valid_to", lit(null).cast("bigint"))
      .withColumn("is_current", lit(true))
    // v1: key 1 changes, key 3 arrives; v2: key 2 departs.
    val h1 = Scd2.apply(v0, Seq((1L, "a", 11.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "name", "v"), Seq("k"), 1L)
    val h2 = Scd2.apply(h1, Seq((1L, "a", 11.0), (3L, "c", 30.0)).toDF("k", "name", "v"), Seq("k"), 2L)
    def snap(ver: Long): Set[(Long, Double)] =
      Scd2.snapshotAt(h2, ver).select("k", "v").as[(Long, Double)].collect().toSet
    assert(snap(0L) === Set((1L, 10.0), (2L, 20.0)))
    assert(snap(1L) === Set((1L, 11.0), (2L, 20.0), (3L, 30.0)))
    assert(snap(2L) === Set((1L, 11.0), (3L, 30.0)))
    // Beyond the last version: identical to the latest snapshot.
    assert(snap(99L) === snap(2L))
    // Before history began: empty, not an error.
    assert(snap(-1L) === Set.empty)
  }

  test("null business key is null-safe matched, not treated as absent") {
    val target = Seq((Option.empty[Long], "n", 1.0)).toDF("k", "name", "v")
      .withColumn("valid_from", lit(0L))
      .withColumn("valid_to", lit(null).cast("bigint"))
      .withColumn("is_current", lit(true))
    val snap = Seq((Option.empty[Long], "n", 2.0)).toDF("k", "name", "v")
    val out = Scd2.apply(target, snap, Seq("k"), version = 3L)
    val got = out.select("name", "v", "valid_to", "is_current").collect()
      .map(r => (r.getString(0), r.getDouble(1), if (r.isNullAt(2)) -99L else r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(got === Set(("n", 1.0, 3L, false), ("n", 2.0, -99L, true)))
  }

  test("enrichAsOf: each fact gets ITS OWN version — never a later one; gaps drop; equi-join plan (no BNLJ)") {
    // Key 1 evolves a->a2 at t=10 and closes (departs) at t=20; key 2 is
    // stable; key 3 exists only in the facts.
    val hist = Seq(
      (1L, "a", 0L, Some(10L), false),
      (1L, "a2", 10L, Some(20L), false),
      (2L, "b", 0L, None, true)
    ).toDF("k", "name", "valid_from", "valid_to", "is_current")
      .withColumn("valid_to", col("valid_to").cast("bigint"))
    val facts = Seq(
      (100L, 1L, 5L),   // inside v0
      (101L, 1L, 10L),  // boundary: v1 opens AT 10 (from-inclusive)
      (102L, 1L, 19L),  // inside v1
      (103L, 1L, 25L),  // after the close: no valid version -> drops
      (104L, 2L, 7L),   // open-ended current row
      (105L, 3L, 7L)    // key absent from history -> drops
    ).toDF("event_id", "k", "ts")
    val out = Scd2.enrichAsOf(
      facts, hist.drop("is_current"), Seq("k" -> "k"), "ts")
    val got = out.select("event_id", "name").as[(Long, String)].collect().toSet
    assert(got === Set((100L, "a"), (101L, "a2"), (102L, "a2"), (104L, "b")))
    // The temporal-leakage property, stated directly: no fact sees a
    // version that opened after its timestamp.
    val leak = Scd2.enrichAsOf(
      facts, hist.drop("is_current").withColumnRenamed("valid_from", "vf")
        .withColumn("valid_from", col("vf")),
      Seq("k" -> "k"), "ts")
      .filter(col("vf") > col("ts")).count()
    assert(leak === 0L)
    // Plan shape: the key conjunct must drive a hash/sort-merge join —
    // interval bounds are the join FILTER, not a nested-loop condition.
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"PIT join fell off the equi path:\n$plan")
  }
}
