package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.GraftSuite
import graft.queries.Fixtures

/** The idempotence laws of manifest-gated shard promotion — the
  * exactly-once batch-ingest contract j9's oracle can only check the
  * end state of. Every law here is a crash-recovery scenario: re-run
  * with the manifest intact (skip), with the manifest lost (layout
  * overwrite), with the manifest PARTIALLY committed (the subtle one —
  * per-file partition keys exist precisely so the unmanifested-subset
  * re-run cannot clobber a manifested neighbor), and incremental
  * arrival of new shards.
  */
class PromoteSpec extends GraftSuite {

  private def schema = new StructType()
    .add("doc_id", LongType).add("lang", StringType).add("n_chars", LongType)

  /** A two-file shard tree: 3 clean + 1 torn in a, 2 clean + 1 torn in b. */
  private def freshTree(): String = {
    val dir = Fixtures.scratchDir("graft-promote-spec")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir, "in"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "in/a.jsonl"),
      Seq("""{"doc_id":1,"lang":"en","n_chars":10}""",
          """{"doc_id":2,"lang":"en","n_chars":20}""",
          """{"doc_id":3,"lang":"fr","n_chars":30}""",
          "torn-in-a").mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "in/b.jsonl"),
      Seq("""{"doc_id":4,"lang":"de","n_chars":40}""",
          """{"doc_id":5,"lang":"de","n_chars":50}""",
          "torn-in-b").mkString("\n").getBytes("UTF-8"))
    dir
  }

  private def promote(dir: String) =
    Ingest.promoteJsonl(spark, s"$dir/in", schema,
      s"$dir/corpus", s"$dir/quarantine", s"$dir/manifest")

  private def corpusIds(dir: String): Seq[Long] =
    spark.read.parquet(s"$dir/corpus").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq

  test("fresh promote: corpus gets every clean row, quarantine every torn line, manifest one row per file") {
    val dir = freshTree()
    val report = promote(dir).collect()
    assert(report.length === 2)
    assert(report.map(r => (r.getAs[String]("src_file").endsWith("a.jsonl"),
      r.getAs[Long]("n_clean"), r.getAs[Long]("n_corrupt"))).toSet ===
      Set((true, 3L, 1L), (false, 2L, 1L)))
    assert(corpusIds(dir) === Seq(1L, 2L, 3L, 4L, 5L))
    assert(spark.read.parquet(s"$dir/quarantine").select("raw_line")
      .collect().map(_.getString(0)).toSet === Set("torn-in-a", "torn-in-b"))
    assert(spark.read.parquet(s"$dir/manifest").count() === 2)
  }

  test("re-promote with manifest intact: no-op — empty report, no duplicate rows") {
    val dir = freshTree()
    promote(dir).collect()
    val again = promote(dir)
    assert(again.isEmpty)
    assert(corpusIds(dir) === Seq(1L, 2L, 3L, 4L, 5L)) // not 1,1,2,2,...
  }

  test("re-promote with manifest LOST: layout idempotence — partitions replaced, never duplicated") {
    val dir = freshTree()
    promote(dir).collect()
    val fs = new java.io.File(s"$dir/manifest")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(fs)
    val report = promote(dir).collect() // full re-read, dynamic overwrite
    assert(report.length === 2)
    assert(corpusIds(dir) === Seq(1L, 2L, 3L, 4L, 5L))
    assert(spark.read.parquet(s"$dir/quarantine").count() === 2)
  }

  test("PARTIAL manifest commit: re-running the unmanifested subset never clobbers a manifested neighbor") {
    val dir = freshTree()
    promote(dir).collect()
    // Simulate a crash that committed only a.jsonl's manifest row: rewrite
    // the manifest without b's row, then re-promote. Only b re-reads; a's
    // corpus partition must survive untouched (per-file src_key grain).
    val kept = spark.read.parquet(s"$dir/manifest")
      .filter(col("src_file").endsWith("a.jsonl")).collect()
    val fs = new java.io.File(s"$dir/manifest")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(fs)
    spark.createDataFrame(java.util.Arrays.asList(kept: _*),
      new StructType()
        .add("src_file", StringType).add("src_shard", StringType)
        .add("n_clean", LongType).add("n_corrupt", LongType))
      .write.mode("overwrite").parquet(s"$dir/manifest")
    val report = promote(dir).collect()
    assert(report.length === 1 && report.head.getAs[String]("src_file").endsWith("b.jsonl"))
    assert(corpusIds(dir) === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("incremental arrival: a new shard promotes alone; existing partitions untouched") {
    val dir = freshTree()
    promote(dir).collect()
    val aPartition = new java.io.File(s"$dir/corpus").listFiles()
      .filter(_.getName.startsWith("src_key=")).map(f => f.getName -> f.lastModified()).toMap
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "in/c.jsonl"),
      Seq("""{"doc_id":6,"lang":"zh","n_chars":60}""",
          "torn-in-c").mkString("\n").getBytes("UTF-8"))
    val report = promote(dir).collect()
    assert(report.length === 1 && report.head.getAs[String]("src_file").endsWith("c.jsonl"))
    assert(corpusIds(dir) === Seq(1L, 2L, 3L, 4L, 5L, 6L))
    assert(spark.read.parquet(s"$dir/quarantine").count() === 3)
    // The pre-existing per-file partitions were not rewritten.
    val after = new java.io.File(s"$dir/corpus").listFiles()
      .filter(_.getName.startsWith("src_key=")).map(f => f.getName -> f.lastModified()).toMap
    for ((name, mtime) <- aPartition) assert(after(name) === mtime, name)
    assert(after.size === aPartition.size + 1)
  }

  test("EMPTY shard converges: a zero-line file lands in the manifest with 0/0 and is never re-read") {
    val dir = freshTree()
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "in/empty.jsonl"),
      Array.empty[Byte])
    val report = promote(dir).collect()
    assert(report.length === 3)
    val empty = report.find(_.getAs[String]("src_file").endsWith("empty.jsonl"))
    assert(empty.isDefined, "empty shard must appear in the promotion report")
    assert(empty.get.getAs[Long]("n_clean") === 0L &&
      empty.get.getAs[Long]("n_corrupt") === 0L)
    assert(spark.read.parquet(s"$dir/manifest").count() === 3)
    // The second run must be a TRUE no-op — the manifest converged.
    assert(promote(dir).isEmpty)
  }

  test("provenance rides along: src_shard + src_file columns in both sinks, manifest counts exact") {
    val dir = freshTree()
    promote(dir).collect()
    val corpus = spark.read.parquet(s"$dir/corpus")
    assert(corpus.columns.toSet ===
      Set("doc_id", "lang", "n_chars", "src_shard", "src_key"))
    assert(corpus.filter(col("src_shard") === "a.jsonl").count() === 3)
    val m = spark.read.parquet(s"$dir/manifest")
      .select("src_shard", "n_clean", "n_corrupt").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(m === Set(("a.jsonl", 3L, 1L), ("b.jsonl", 2L, 1L)))
  }
}
