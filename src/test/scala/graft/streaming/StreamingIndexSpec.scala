package graft.streaming

import org.apache.spark.sql.functions._

import graft.GraftSuite
import graft.pipeline.{Similarity, TextStats}

/** Streaming BM25 index maintenance: the converged index equals the
  * batch-built one bit-for-bit, replayed batches are skipped through the
  * promoted watermark, and every crash window (interrupted bootstrap,
  * interrupted append) recovers to the exactly-once answer.
  */
class StreamingIndexSpec extends GraftSuite {
  import spark.implicits._

  private val b0 = Seq(
    (1L, "dup dup alpha beta"),
    (2L, "merge alpha beta gamma delta")
  ).toDF("doc_id", "text")
  private val b1 = Seq(
    (3L, "alpha beta gamma delta epsilon zeta"),
    (4L, "dup merge alpha")
  ).toDF("doc_id", "text")
  private val b2 = Seq(
    (5L, "merge merge dup beta beta")
  ).toDF("doc_id", "text")

  private def probe(path: String): Seq[String] =
    TextStats.bm25IndexTopK(spark, path, Seq("dup", "merge"), k = 5)
      .collect().map(_.toString).sorted.toSeq

  test("converged stream == batch build; replayed batches skip through the watermark") {
    val base = java.nio.file.Files.createTempDirectory("stridx")
    val idx = base.resolve("idx").toString
    StreamingIndex.applyBatch(b0, 0L, idx, "doc_id", "text", nBuckets = 8)
    StreamingIndex.applyBatch(b1, 1L, idx, "doc_id", "text", nBuckets = 8)
    // Replays of BOTH already-landed batches are no-ops (watermark = 1).
    StreamingIndex.applyBatch(b0, 0L, idx, "doc_id", "text", nBuckets = 8)
    StreamingIndex.applyBatch(b1, 1L, idx, "doc_id", "text", nBuckets = 8)
    StreamingIndex.applyBatch(b2, 2L, idx, "doc_id", "text", nBuckets = 8)
    assert(TextStats.readBm25StreamBatch(spark, idx) === Some(2L))

    val fresh = base.resolve("fresh").toString
    TextStats.writeBm25Index(b0.unionByName(b1).unionByName(b2),
      "doc_id", "text", fresh, nBuckets = 8)
    assert(probe(idx) === probe(fresh))
  }

  test("crash windows: interrupted bootstrap rebuilds; interrupted append rolls forward then skips the replay") {
    val base = java.nio.file.Files.createTempDirectory("stridx-crash")
    val idx = base.resolve("idx").toString
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // Interrupted bootstrap: the index content landed but the crash hit
    // before the watermark — an index-without-watermark. The replayed
    // batch 0 must REBUILD (overwrite), not append a duplicate.
    TextStats.writeBm25Index(b0, "doc_id", "text", idx, nBuckets = 8)
    assert(TextStats.readBm25StreamBatch(spark, idx) === None)
    StreamingIndex.applyBatch(b0, 0L, idx, "doc_id", "text", nBuckets = 8)
    assert(TextStats.readBm25StreamBatch(spark, idx) === Some(0L))
    val freshB0 = base.resolve("fresh0").toString
    TextStats.writeBm25Index(b0, "doc_id", "text", freshB0, nBuckets = 8)
    assert(probe(idx) === probe(freshB0))

    // Interrupted append: batch 1 staged completely + marker written,
    // crash before promotion. Stage it for real through the public API
    // against a copy, then reconstruct the crash state: move the live
    // changes back so only staging + marker exist.
    // Simpler equivalent: stage via appendToBm25Index on a THROWAWAY
    // copy is overkill — instead drive the real append, then verify the
    // replay path: a replay of batch 1 after it landed must be a no-op.
    StreamingIndex.applyBatch(b1, 1L, idx, "doc_id", "text", nBuckets = 8)
    val after1 = probe(idx)
    StreamingIndex.applyBatch(b1, 1L, idx, "doc_id", "text", nBuckets = 8) // replay
    assert(probe(idx) === after1)
    assert(TextStats.readBm25StreamBatch(spark, idx) === Some(1L))

    // True mid-promotion crash: rebuild the staged state for batch 2 by
    // hand (staged postings from a scratch build + staged sidecars +
    // staged watermark + intent marker), then replay batch 2 — the
    // recover-first step promotes the staged append (watermark 2 lands
    // WITH it), and the replay skips instead of double-appending.
    val scratch = base.resolve("scratch").toString
    TextStats.writeBm25Index(b2, "doc_id", "text", scratch, nBuckets = 8)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$idx/append.staging"))
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$scratch/postings"),
      new org.apache.hadoop.fs.Path(s"$idx/append.staging/postings")))
    spark.read.parquet(s"$idx/terms")
      .unionByName(spark.read.parquet(s"$idx/append.staging/postings")
        .groupBy("term").agg(count(lit(1)).as("df")))
      .groupBy("term").agg(sum("df").as("df"))
      .write.parquet(s"$idx/append.staging/terms")
    val c0 = spark.read.parquet(s"$idx/corpus").head()
    val d0 = spark.read.parquet(s"$scratch/corpus").head()
    spark.range(1).select(
      lit(c0.getLong(c0.fieldIndex("n")) + d0.getLong(d0.fieldIndex("n"))).as("n"),
      lit(c0.getLong(c0.fieldIndex("sumdl")) + d0.getLong(d0.fieldIndex("sumdl"))).as("sumdl"),
      lit(c0.getInt(c0.fieldIndex("n_buckets"))).as("n_buckets"))
      .coalesce(1).write.parquet(s"$idx/append.staging/corpus")
    TextStats.writeBm25StreamBatch(fs,
      s"$idx/append.staging", 2L)
    fs.create(new org.apache.hadoop.fs.Path(idx, "_graft_append_intent"), true).close()

    StreamingIndex.applyBatch(b2, 2L, idx, "doc_id", "text", nBuckets = 8)
    assert(TextStats.readBm25StreamBatch(spark, idx) === Some(2L))
    val freshAll = base.resolve("freshAll").toString
    TextStats.writeBm25Index(b0.unionByName(b1).unionByName(b2),
      "doc_id", "text", freshAll, nBuckets = 8)
    assert(probe(idx) === probe(freshAll))
  }

  test("torn watermark reads as None and the interrupted-bootstrap rebuild self-heals it") {
    // ADVICE r13 #1: a crash mid-watermark-write used to leave an
    // empty/partial _graft_stream_batch that every later batch died
    // parsing. The write is now temp+rename (atomic), and a torn file —
    // planted here by hand — must read as None so the documented
    // index-without-watermark rebuild path repairs it.
    val base = java.nio.file.Files.createTempDirectory("stridx-torn")
    val idx = base.resolve("idx").toString
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    TextStats.writeBm25Index(b0, "doc_id", "text", idx, nBuckets = 8)
    val torn = fs.create(new org.apache.hadoop.fs.Path(idx, "_graft_stream_batch"), true)
    try torn.write("1".getBytes("UTF-8").take(0)) finally torn.close() // empty = torn
    assert(TextStats.readBm25StreamBatch(spark, idx) === None)
    // The replayed bootstrap batch rebuilds (overwrite), watermark heals.
    StreamingIndex.applyBatch(b0, 0L, idx, "doc_id", "text", nBuckets = 8)
    assert(TextStats.readBm25StreamBatch(spark, idx) === Some(0L))
    val fresh = base.resolve("fresh").toString
    TextStats.writeBm25Index(b0, "doc_id", "text", fresh, nBuckets = 8)
    assert(probe(idx) === probe(fresh))
    // Garbage (non-numeric) is as torn as empty — same None contract.
    val g = fs.create(new org.apache.hadoop.fs.Path(idx, "_graft_stream_batch"), true)
    try g.write("garbage".getBytes("UTF-8")) finally g.close()
    assert(TextStats.readBm25StreamBatch(spark, idx) === None)
    assert(Similarity.readPqStreamBatch(spark, idx) === None) // PQ twin reads the same file name
  }

  test("streaming IVFADC maintenance: converged == batch build, replays skip, probes gate mid-promotion") {
    val cents = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.0f, 0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val cb = Similarity.pqGridCodebooks(dim = 4, m = 2, k = 16)
    val v0 = Seq((10L, Seq(0.9f, 0.1f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val v1 = Seq(
      (11L, Seq(0.8f, 0.0f, 0.1f, 0.0f)),
      (20L, Seq(0.0f, 0.1f, 0.0f, 0.9f))
    ).toDF("vec_id", "embedding")
    val v2 = Seq((21L, Seq(0.0f, 0.0f, 0.1f, 0.8f))).toDF("vec_id", "embedding")
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    val base = java.nio.file.Files.createTempDirectory("stridx-pq")
    val idx = base.resolve("idx").toString

    StreamingIndex.applyPqBatch(v0, 0L, idx, "vec_id", "embedding", cents, cb)
    StreamingIndex.applyPqBatch(v1, 1L, idx, "vec_id", "embedding", cents, cb)
    // Replays of landed batches are no-ops (watermark = 1).
    StreamingIndex.applyPqBatch(v0, 0L, idx, "vec_id", "embedding", cents, cb)
    StreamingIndex.applyPqBatch(v1, 1L, idx, "vec_id", "embedding", cents, cb)
    StreamingIndex.applyPqBatch(v2, 2L, idx, "vec_id", "embedding", cents, cb)
    assert(Similarity.readPqStreamBatch(spark, idx) === Some(2L))

    def probePq(path: String, np: Int): Seq[(Long, Double)] =
      Similarity.pqIndexTopK(spark, path, "vec_id", q, k = 4, nProbe = np)
        .as[(Long, Double)].collect().sorted.toSeq
    val fresh = base.resolve("fresh").toString
    Similarity.writePqIndex(
      v0.unionByName(v1).unionByName(v2), cents, "vec_id", "embedding", cb, fresh)
    for (np <- Seq(1, 2))
      assert(probePq(idx, np) === probePq(fresh, np), s"nProbe=$np")

    // Mid-promotion crash: stage batch 3 by hand (codes from a scratch
    // build + staged watermark + marker). Probes fail loudly; the next
    // applyPqBatch recovers forward then skips the replay.
    val v3 = Seq((12L, Seq(0.7f, 0.1f, 0.1f, 0.0f))).toDF("vec_id", "embedding")
    val scratch = base.resolve("scratch").toString
    Similarity.writePqIndex(v3, cents, "vec_id", "embedding", cb, scratch)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$idx/append.staging"))
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$scratch/codes"),
      new org.apache.hadoop.fs.Path(s"$idx/append.staging/codes")))
    Similarity.writePqStreamBatch(fs, s"$idx/append.staging", 3L)
    fs.create(new org.apache.hadoop.fs.Path(idx, "_graft_append_intent"), true).close()
    intercept[IllegalStateException] { probePq(idx, 1) }
    StreamingIndex.applyPqBatch(v3, 3L, idx, "vec_id", "embedding", cents, cb)
    assert(Similarity.readPqStreamBatch(spark, idx) === Some(3L))
    val freshAll = base.resolve("freshAll").toString
    Similarity.writePqIndex(
      v0.unionByName(v1).unionByName(v2).unionByName(v3),
      cents, "vec_id", "embedding", cb, freshAll)
    for (np <- Seq(1, 2))
      assert(probePq(idx, np) === probePq(freshAll, np), s"post-crash nProbe=$np")

    // Interrupted bootstrap: index content without a watermark rebuilds.
    val idx2 = base.resolve("idx2").toString
    Similarity.writePqIndex(v0, cents, "vec_id", "embedding", cb, idx2)
    assert(Similarity.readPqStreamBatch(spark, idx2) === None)
    StreamingIndex.applyPqBatch(v0, 0L, idx2, "vec_id", "embedding", cents, cb)
    assert(Similarity.readPqStreamBatch(spark, idx2) === Some(0L))
    val fresh0 = base.resolve("fresh0").toString
    Similarity.writePqIndex(v0, cents, "vec_id", "embedding", cb, fresh0)
    assert(probePq(idx2, 2) === probePq(fresh0, 2))
  }

  test("streaming sketch-store maintenance: converged == batch, replays are no-ops without a watermark, torn bootstrap rebuilds") {
    import graft.operators.Sketches
    val keys = Seq("event_type", "day")
    def batch(rows: (String, String, Long)*) =
      rows.toDF("event_type", "day", "user_id")
    // Day d1 arrives split across b0 and b1 (the read-union-replace
    // path); b1 also opens day d2.
    val b0 = batch(("click", "d1", 1L), ("click", "d1", 2L), ("view", "d1", 1L))
    val b1 = batch(("click", "d1", 2L), ("click", "d1", 3L), ("view", "d2", 9L))
    val b2 = batch(("view", "d2", 10L), ("click", "d2", 3L))
    val base = java.nio.file.Files.createTempDirectory("stridx-sk")
    val store = base.resolve("store").toString
    def answers() = Sketches.storedEstimate(spark, store, Seq("event_type"))
      .as[(String, Long)].collect().toMap

    StreamingIndex.applySketchBatch(b0, store, keys, "user_id")
    StreamingIndex.applySketchBatch(b1, store, keys, "user_id")
    // Replays — of the BOOTSTRAP batch and of an append batch — change
    // nothing: the HLL semilattice absorbs re-union, no watermark needed.
    val afterTwo = answers()
    StreamingIndex.applySketchBatch(b0, store, keys, "user_id")
    StreamingIndex.applySketchBatch(b1, store, keys, "user_id")
    assert(answers() === afterTwo)
    StreamingIndex.applySketchBatch(b2, store, keys, "user_id")
    val all = b0.unionByName(b1).unionByName(b2)
    val exact = all.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(answers() === exact)
    // Slice rows are one per (type, day) — the split day merged, not
    // duplicated.
    assert(graft.merge.PartitionedTarget.read(spark, store)
      .groupBy(keys.map(col): _*).count().filter(col("count") > 1).isEmpty)

    // Torn bootstrap: parquet content without the spec sidecar reads as
    // "no store yet" and the next batch rebuilds it whole.
    val store2 = base.resolve("store2").toString
    Sketches.distinctSketches(b0, keys, "user_id")
      .write.parquet(store2) // no sidecar — a bootstrap that died mid-write
    StreamingIndex.applySketchBatch(b0, store2, keys, "user_id")
    assert(Sketches.storedEstimate(spark, store2, Seq("event_type"))
      .as[(String, Long)].collect().toMap ===
      b0.groupBy("event_type").agg(count_distinct(col("user_id")).as("n"))
        .as[(String, Long)].collect().toMap)
  }

  test("streaming quantile-store maintenance: converged == batch inclusive quantiles, the in-row watermark skips replays of the non-idempotent merge, torn bootstrap rebuilds") {
    import graft.operators.Sketches
    val keys = Seq("lang", "source")
    def batch(rows: (String, String, Long)*) =
      rows.toDF("lang", "source", "n_chars")
    // Slice (en, a) recurs in every batch — the read-merge-replace path
    // runs repeatedly; b2 opens a fresh slice.
    val b0 = batch(("en", "a", 10L), ("en", "a", 20L), ("fr", "b", 30L))
    val b1 = batch(("en", "a", 30L), ("fr", "b", 10L), ("fr", "b", 50L))
    val b2 = batch(("en", "a", 40L), ("de", "c", 5L))
    val base = java.nio.file.Files.createTempDirectory("stridx-kll")
    val store = base.resolve("store").toString
    val ranks = Seq(0.5, 0.95)
    def answers() = Sketches.storedQuantiles(spark, store, Seq("lang"), ranks)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    StreamingIndex.applyQuantileBatch(b0, 0L, store, keys, "n_chars")
    StreamingIndex.applyQuantileBatch(b1, 1L, store, keys, "n_chars")
    val afterTwo = answers()

    // The algebra the watermark exists for: KLL merge is a weighted
    // sample union, NOT a semilattice — bypassing the watermark and
    // re-merging b1's slices doubles n.
    val clone = base.resolve("clone").toString
    StreamingIndex.applyQuantileBatch(b0, 0L, clone, keys, "n_chars")
    val nBefore = Sketches.storedQuantiles(spark, clone, Seq("lang"), ranks)
      .agg(sum(col("n"))).first().getLong(0)
    Sketches.mergeQuantilesIntoStore(spark, clone,
      Sketches.quantileSketches(b0, keys, "n_chars").withColumn("batch_id", lit(99L)))
    assert(Sketches.storedQuantiles(spark, clone, Seq("lang"), ranks)
      .agg(sum(col("n"))).first().getLong(0) === 2 * nBefore)

    // With the watermark: replays of the bootstrap batch and of an
    // append batch are exact no-ops.
    StreamingIndex.applyQuantileBatch(b0, 0L, store, keys, "n_chars")
    StreamingIndex.applyQuantileBatch(b1, 1L, store, keys, "n_chars")
    assert(answers() === afterTwo)

    // Converged == the batch inclusive-rule quantiles over all rows.
    StreamingIndex.applyQuantileBatch(b2, 2L, store, keys, "n_chars")
    val all = b0.unionByName(b1).unionByName(b2)
    val exact = all.select("lang", "n_chars").as[(String, Long)].collect()
      .groupBy(_._1).map { case (l, rows) =>
        val vs = rows.map(_._2).sorted
        def q(r: Double) = vs(math.ceil(r * vs.length).toInt - 1)
        l -> ((vs.length.toLong, q(0.5), q(0.95)))
      }
    assert(answers() === exact)
    // One row per slice forever — no row growth, no compaction protocol.
    assert(graft.merge.PartitionedTarget.read(spark, store)
      .groupBy(keys.map(col): _*).count().filter(col("count") > 1).isEmpty)
    // The watermark rides in the rows: max(batch_id) == the last batch.
    assert(graft.merge.PartitionedTarget.read(spark, store)
      .agg(max(col("batch_id"))).first().getLong(0) === 2L)

    // Torn bootstrap: parquet without the spec sidecar reads as "no
    // store yet"; the bootstrap replay rebuilds it whole.
    val store2 = base.resolve("store2").toString
    Sketches.quantileSketches(b0, keys, "n_chars")
      .withColumn("batch_id", lit(0L)).write.parquet(store2)
    StreamingIndex.applyQuantileBatch(b0, 0L, store2, keys, "n_chars")
    val exact0 = b0.select("lang", "n_chars").as[(String, Long)].collect()
      .groupBy(_._1).map { case (l, rows) =>
        val vs = rows.map(_._2).sorted
        def q(r: Double) = vs(math.ceil(r * vs.length).toInt - 1)
        l -> ((vs.length.toLong, q(0.5), q(0.95)))
      }
    assert(Sketches.storedQuantiles(spark, store2, Seq("lang"), ranks)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap === exact0)
  }

  test("streaming count-min-store maintenance: converged == single-pass sketch byte-for-byte, the in-row watermark skips replays of the additive merge, torn bootstrap rebuilds") {
    import graft.operators.Sketches
    import org.apache.spark.util.sketch.CountMinSketch
    val keys = Seq("day")
    def batch(rows: (String, Long)*) = rows.toDF("day", "user_id")
    // Day d1 straddles every batch — the read-merge-replace path runs
    // repeatedly; d3 opens a fresh slice.
    val b0 = batch(("d1", 7L), ("d1", 7L), ("d2", 3L))
    val b1 = batch(("d1", 7L), ("d2", 3L), ("d2", 9L))
    val b2 = batch(("d1", 4L), ("d3", 7L))
    val base = java.nio.file.Files.createTempDirectory("stridx-cms")
    val store = base.resolve("store").toString
    def est(key: Long): Long = {
      val merged = Sketches.mergeFreqSketches(
        graft.merge.PartitionedTarget.read(spark, store))
      CountMinSketch.readFrom(new java.io.ByteArrayInputStream(merged))
        .estimateCount(java.lang.Long.valueOf(key))
    }

    StreamingIndex.applyFreqBatch(b0, 0L, store, keys, "user_id")
    StreamingIndex.applyFreqBatch(b1, 1L, store, keys, "user_id")
    val afterTwo = Seq(7L, 3L, 9L).map(est)

    // The algebra the watermark exists for: CMS is linear-additive —
    // bypassing the watermark and re-merging b1's slices doubles the
    // counts b1 contributed.
    val clone = base.resolve("clone").toString
    StreamingIndex.applyFreqBatch(b0, 0L, clone, keys, "user_id")
    StreamingIndex.applyFreqBatch(b1, 1L, clone, keys, "user_id")
    Sketches.mergeFreqIntoStore(spark, clone,
      Sketches.freqSketches(b1, keys, "user_id").withColumn("batch_id", lit(99L)))
    val mergedClone = Sketches.mergeFreqSketches(
      graft.merge.PartitionedTarget.read(spark, clone))
    val cmsClone = CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(mergedClone))
    // user 9 appears once, only in b1: the bypassed replay counts it twice
    assert(cmsClone.estimateCount(java.lang.Long.valueOf(9L)) === 2L)

    // With the watermark: replays of the bootstrap batch and of an
    // append batch are exact no-ops.
    StreamingIndex.applyFreqBatch(b0, 0L, store, keys, "user_id")
    StreamingIndex.applyFreqBatch(b1, 1L, store, keys, "user_id")
    assert(Seq(7L, 3L, 9L).map(est) === afterTwo)

    // Converged == the single-pass whole-corpus sketch, byte for byte
    // (CMS linearity end-to-end through the store).
    StreamingIndex.applyFreqBatch(b2, 2L, store, keys, "user_id")
    val all = b0.unionByName(b1).unionByName(b2).withColumn("g", lit("all"))
    val single = Sketches.freqSketches(all, Seq("g"), "user_id")
      .select("sketch").as[Array[Byte]].first()
    val converged = Sketches.mergeFreqSketches(
      graft.merge.PartitionedTarget.read(spark, store))
    assert(java.util.Arrays.equals(converged, single))
    // One row per slice forever; the watermark rides in the rows.
    assert(graft.merge.PartitionedTarget.read(spark, store)
      .groupBy(keys.map(col): _*).count().filter(col("count") > 1).isEmpty)
    assert(graft.merge.PartitionedTarget.read(spark, store)
      .agg(max(col("batch_id"))).first().getLong(0) === 2L)

    // Torn bootstrap: parquet without the spec sidecar reads as "no
    // store yet"; the bootstrap replay rebuilds it whole.
    val store2 = base.resolve("store2").toString
    Sketches.freqSketches(b0, keys, "user_id")
      .withColumn("batch_id", lit(0L)).write.parquet(store2)
    StreamingIndex.applyFreqBatch(b0, 0L, store2, keys, "user_id")
    val single0 = Sketches.freqSketches(
        b0.withColumn("g", lit("all")), Seq("g"), "user_id")
      .select("sketch").as[Array[Byte]].first()
    assert(java.util.Arrays.equals(
      Sketches.mergeFreqSketches(
        graft.merge.PartitionedTarget.read(spark, store2)),
      single0))
  }

  test("streaming vocabulary-store maintenance: converged vocab == batch build bit-for-bit, in-row watermark skips replays of the additive sum, torn bootstrap rebuilds") {
    import graft.pipeline.Vocab
    val base = java.nio.file.Files.createTempDirectory("stridx-vocab")
    val store = base.resolve("store").toString
    def vocab(path: String) = Vocab.vocabFromStore(spark, path, vocabSize = 100)
      .as[(Long, String, Long)].collect().toSeq

    StreamingIndex.applyVocabBatch(b0, 0L, store, "text")
    StreamingIndex.applyVocabBatch(b1, 1L, store, "text")
    val afterTwo = vocab(store)

    // The algebra the watermark exists for: exact counts are additive —
    // bypassing the watermark and re-merging b0's counts doubles them.
    val clone = base.resolve("clone").toString
    StreamingIndex.applyVocabBatch(b0, 0L, clone, "text")
    val dupBefore = vocab(clone).collectFirst { case (_, "dup", n) => n }.get
    Vocab.mergeCountsIntoStore(spark, clone,
      Vocab.tokenCounts(b0, "text").withColumn("batch_id", lit(99L)))
    assert(vocab(clone).collectFirst { case (_, "dup", n) => n }.get === 2 * dupBefore)

    // With the watermark: replays of bootstrap and append batches are
    // exact no-ops.
    StreamingIndex.applyVocabBatch(b0, 0L, store, "text")
    StreamingIndex.applyVocabBatch(b1, 1L, store, "text")
    assert(vocab(store) === afterTwo)

    // Converged == the batch build over all docs, bit-for-bit (same
    // counts, same tie-break, same ids).
    StreamingIndex.applyVocabBatch(b2, 2L, store, "text")
    val batchBuild = Vocab.build(b0.unionByName(b1).unionByName(b2), "text", 100)
      .as[(Long, String, Long)].collect().toSeq
    assert(vocab(store) === batchBuild)
    // One row per token forever; the watermark rides in the rows.
    val stored = graft.merge.PartitionedTarget.read(spark, store)
    assert(stored.groupBy("token").count().filter(col("count") > 1).isEmpty)
    assert(stored.agg(max(col("batch_id"))).first().getLong(0) === 2L)

    // Torn bootstrap: parquet without the spec sidecar reads as "no
    // store yet"; the bootstrap replay rebuilds it whole.
    val store2 = base.resolve("store2").toString
    Vocab.tokenCounts(b0, "text").withColumn("batch_id", lit(0L))
      .write.parquet(store2)
    StreamingIndex.applyVocabBatch(b0, 0L, store2, "text")
    assert(vocab(store2) === Vocab.build(b0, "text", 100)
      .as[(Long, String, Long)].collect().toSeq)
  }

  test("streaming n-gram-store maintenance: converged model == one-pass counts bit-for-bit, in-row watermark skips replays of the additive sum, torn bootstrap rebuilds") {
    val base = java.nio.file.Files.createTempDirectory("stridx-ngram")
    val store = base.resolve("store").toString
    val order = 3
    def model(path: String) =
      TextStats.ngramModelFromStore(spark, path, order)
        .as[(String, String, String, Long)].collect().sorted.toSeq
    def onePass(docs: org.apache.spark.sql.DataFrame) =
      TextStats.ngramCounts(docs, "text", order)
        .as[(String, String, String, Long)].collect().sorted.toSeq

    StreamingIndex.applyNgramBatch(b0, 0L, store, "text", order)
    StreamingIndex.applyNgramBatch(b1, 1L, store, "text", order)
    val afterTwo = model(store)

    // The algebra the watermark exists for: counts are additive —
    // bypassing the watermark and re-merging b0's grams doubles them.
    val clone = base.resolve("clone").toString
    StreamingIndex.applyNgramBatch(b0, 0L, clone, "text", order)
    val before = model(clone).collectFirst {
      case ("dup", "dup", "alpha", n) => n }.get
    TextStats.mergeNgramCountsIntoStore(spark, clone,
      TextStats.ngramCounts(b0, "text", order).withColumn("batch_id", lit(99L)))
    assert(model(clone).collectFirst {
      case ("dup", "dup", "alpha", n) => n }.get === 2 * before)

    // With the watermark: replays of bootstrap and append batches are
    // exact no-ops.
    StreamingIndex.applyNgramBatch(b0, 0L, store, "text", order)
    StreamingIndex.applyNgramBatch(b1, 1L, store, "text", order)
    assert(model(store) === afterTwo)

    // Converged == the one-pass count build over all docs, bit-for-bit
    // (gram windows never cross documents, so batch-wise sums ARE the
    // corpus counts) — and therefore every MKN quantity derived from
    // the model is the one-pass model's.
    StreamingIndex.applyNgramBatch(b2, 2L, store, "text", order)
    assert(model(store) === onePass(b0.unionByName(b1).unionByName(b2)))
    // One row per gram forever; the watermark rides in the rows.
    val stored = graft.merge.PartitionedTarget.read(spark, store)
    assert(stored.groupBy("w1", "w2", "w3").count()
      .filter(col("count") > 1).isEmpty)
    assert(stored.agg(max(col("batch_id"))).first().getLong(0) === 2L)

    // Torn bootstrap: parquet without the spec sidecar reads as "no
    // store yet"; the bootstrap replay rebuilds it whole.
    val store2 = base.resolve("store2").toString
    TextStats.ngramCounts(b0, "text", order).withColumn("batch_id", lit(0L))
      .write.parquet(store2)
    StreamingIndex.applyNgramBatch(b0, 0L, store2, "text", order)
    assert(model(store2) === onePass(b0))
  }

  test("store watermark sidecar: steady-state read touches NO store data, crash doubt resolves once then goes marker-only, pre-sidecar stores reconcile on first touch") {
    val base = java.nio.file.Files.createTempDirectory("stridx-wm")
    val store = base.resolve("store").toString
    val order = 3
    val dir = new org.apache.hadoop.fs.Path(store)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def names = fs.listStatus(dir).map(_.getPath.getName).toSeq
    def model(path: String) =
      TextStats.ngramModelFromStore(spark, path, order)
        .as[(String, String, String, Long)].collect().sorted.toSeq

    StreamingIndex.applyNgramBatch(b0, 0L, store, "text", order)
    StreamingIndex.applyNgramBatch(b1, 1L, store, "text", order)

    // THE r19 ask, pinned: in the steady state the watermark read is a
    // directory listing only — the doubt-resolution scan thunk must not
    // be forced. A thrown thunk IS the proof no store data was read.
    assert(StoreWatermark.landed(spark, store,
      fail("steady-state watermark read forced a store data scan")) === 1L)
    // Exactly one committed marker (older ones are swept), no intents.
    assert(names.count(_.startsWith("_graft_watermark_v")) === 1)
    assert(names.exists(_ == "_graft_watermark_v1"))
    assert(!names.exists(_.startsWith("_graft_watermark_intent_")))

    // Crash window A — intent landed, apply ROLLED BACK (simulated: the
    // intent marker exists but batch 2 never merged). The doubt read
    // scans once, answers 1, clears the intent, and the replayed batch 2
    // then applies exactly once.
    StoreWatermark.begin(spark, store, 2L)
    var scanned = 0
    assert(StoreWatermark.landed(spark, store,
      { scanned += 1
        graft.merge.PartitionedTarget.read(spark, store)
          .agg(max(col("batch_id"))).first().getLong(0) }) === 1L)
    assert(scanned === 1)
    // Doubt resolved and re-committed: the next read is marker-only again.
    assert(StoreWatermark.landed(spark, store,
      fail("post-recovery watermark read forced a store data scan")) === 1L)
    StreamingIndex.applyNgramBatch(b2, 2L, store, "text", order)
    val full = model(store)
    assert(full === TextStats.ngramCounts(
      b0.unionByName(b1).unionByName(b2), "text", order)
      .as[(String, String, String, Long)].collect().sorted.toSeq)

    // Crash window B — apply COMMITTED but the crash hit before the
    // commit marker (simulated: drop the committed marker, leave the
    // intent). The doubt scan reports batch 2 landed; the replay SKIPS —
    // counts stay exactly-once.
    StoreWatermark.begin(spark, store, 2L)
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_graft_watermark_v2"), false)
    StreamingIndex.applyNgramBatch(b2, 2L, store, "text", order)
    assert(model(store) === full)
    assert(StoreWatermark.landed(spark, store,
      fail("reconciled watermark read forced a store data scan")) === 2L)

    // Pre-sidecar store (st19-era layout): no markers at all. First
    // touch reconciles from the rows' batch ids, then goes marker-only;
    // a replay through the maintainer still skips.
    names.filter(_.startsWith("_graft_watermark")).foreach(n =>
      fs.delete(new org.apache.hadoop.fs.Path(dir, n), false))
    StreamingIndex.applyNgramBatch(b2, 2L, store, "text", order)
    assert(model(store) === full)
    assert(StoreWatermark.landed(spark, store,
      fail("reconciled pre-sidecar read forced a store data scan")) === 2L)
  }
}
