package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.GraftSuite
import graft.merge.{ChangeFeed, PartitionSpec, PartitionedTarget}
import graft.pipeline.HashMode

/** Streaming/partitioned CDC apply: multi-op collapse order, bucket-pruned
  * partitioned application with delete-only bucket retirement, replay
  * idempotence, and the plain-directory fallback path.
  */
class StreamingCdcSpec extends GraftSuite {
  import spark.implicits._

  private val spec = PartitionSpec(Seq("k"), 8, HashMode.Xxhash64)

  private def freshDir(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("t").toString

  test("latestPerKey: the log's highest seq wins per key, seq column dropped") {
    val batch = Seq(
      (1L, "first", "I", 10L), (1L, "second", "U", 20L), (1L, "gone", "D", 30L),
      (2L, "dead", "D", 5L), (2L, "back", "I", 6L),
      (3L, "only", "U", 1L)
    ).toDF("k", "name", "op", "seq")
    val out = StreamingCdc.latestPerKey(batch, Seq("k"), "op", Some("seq"))
      .select("k", "name", "op").as[(Long, String, String)].collect().toSet
    assert(out === Set((1L, "gone", "D"), (2L, "back", "I"), (3L, "only", "U")))
    assert(!StreamingCdc.latestPerKey(batch, Seq("k"), "op", Some("seq")).columns.contains("seq"))
  }

  test("partitioned CDC apply: D removes, U/I upsert, absent keys untouched, delete-only bucket retired") {
    val dir = freshDir("graft-cdc")
    // 3 keys per bucket would interleave; use enough keys that at least
    // one bucket holds ONLY the deleted key — find one empirically.
    val keys = (0L until 40L)
    val target = keys.map(i => (i, s"n$i", i * 1.0)).toDF("k", "name", "v")
    PartitionedTarget.write(target, dir, spec)
    val bucketOf = keys.toDF("k").select($"k", spec.bucket(Seq(col("k"))).as("b"))
      .as[(Long, Int)].collect().toMap
    // A key alone in its bucket (guaranteed by pigeonhole? no — by search).
    val loner = keys.find(k => bucketOf.values.count(_ == bucketOf(k)) == 1)

    val feed = Seq(
      (1L, null.asInstanceOf[String], null.asInstanceOf[java.lang.Double], "D"),
      (2L, "two-new", java.lang.Double.valueOf(22.0), "U"),
      (100L, "fresh", java.lang.Double.valueOf(1.0), "I")
    ).toDF("k", "name", "v", "op")
    val touched = ChangeFeed.applyToPartitioned(spark, dir, feed, Seq("k"))
    assert(touched.nonEmpty && touched.size <= 3)

    val state = PartitionedTarget.read(spark, dir)
      .select("k", "name").as[(Long, String)].collect().toMap
    assert(!state.contains(1L))
    assert(state(2L) === "two-new")
    assert(state(100L) === "fresh")
    assert(state(3L) === "n3") // untouched key intact
    assert(state.size === 40 - 1 + 1)

    // Replay idempotence: f(f(s,b),b) == f(s,b).
    ChangeFeed.applyToPartitioned(spark, dir, feed, Seq("k"))
    val replayed = PartitionedTarget.read(spark, dir)
      .select("k", "name").as[(Long, String)].collect().toMap
    assert(replayed === state)

    // Delete-only bucket: D the loner key and its directory retires.
    loner.foreach { lk =>
      val dfeed = Seq((lk, null.asInstanceOf[String], null.asInstanceOf[java.lang.Double], "D"))
        .toDF("k", "name", "v", "op")
      ChangeFeed.applyToPartitioned(spark, dir, dfeed, Seq("k"))
      val dirGone = !Files.exists(java.nio.file.Paths.get(dir, s"${PartitionedTarget.BucketCol}=${bucketOf(lk)}"))
      assert(dirGone, s"bucket dir of lone key $lk should retire when its only row is deleted")
      assert(!PartitionedTarget.read(spark, dir).select("k").as[Long].collect().contains(lk))
    }
  }

  test("empty feed is a no-op returning no touched buckets") {
    val dir = freshDir("graft-cdc-empty")
    PartitionedTarget.write(Seq((1L, "a")).toDF("k", "name"), dir, spec)
    val feed = Seq.empty[(Long, String, String)].toDF("k", "name", "op")
    assert(ChangeFeed.applyToPartitioned(spark, dir, feed, Seq("k")) === Seq.empty)
    assert(PartitionedTarget.read(spark, dir).count() === 1L)
  }
}
