package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}

import graft.GraftSuite
import graft.queries.Fixtures

/** The ingestion-boundary contracts the j-queries rely on but cannot
  * hash-check cross-engine: raw-byte preservation, clean/quarantine
  * totality, the drift-vs-tear asymmetry, provenance, the persisted
  * quarantine sink, gzip parallelism, and the embedded-newline CSV
  * failure mode.
  */
class IngestSpec extends GraftSuite {

  private def schema = new StructType()
    .add("doc_id", LongType).add("lang", StringType).add("n_chars", LongType)

  /** Write `lines` verbatim as one text shard file; returns (dir, file). */
  private def shard(lines: Seq[String], name: String = "shard.jsonl"): (String, String) = {
    val dir = Fixtures.scratchDir("graft-ingest-spec")
    val f = java.nio.file.Paths.get(dir, name)
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    (dir, f.toString)
  }

  private val good = Seq(
    """{"doc_id":1,"lang":"en","n_chars":10}""",
    """{"doc_id":2,"lang":"fr","n_chars":20}""")
  private val torn = Seq(
    """{"doc_id":3,"lang":"de","n_ch""", // torn mid-key
    """ ###{"doc_id":4,"lang":"es","n_chars":40}""") // prefix damage

  test("jsonl quarantine preserves damaged lines verbatim — exact raw bytes, nothing else") {
    val (dir, _) = shard(good ++ torn)
    val (clean, quarantine) = Ingest.jsonl(spark, dir, schema)
    val rawBack = quarantine.select("raw_line").collect().map(_.getString(0)).toSet
    assert(rawBack === torn.toSet)
    assert(clean.select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L, 2L))
  }

  test("totality: every input line lands in exactly one of (clean, quarantine)") {
    val (dir, _) = shard(good ++ torn)
    val parsed = Ingest.parseJsonl(
      spark.read.textFile(dir).toDF("value"), "value", schema)
    val n = spark.read.textFile(dir).count()
    val (clean, quarantine) = (Ingest.cleanOf(parsed, schema), Ingest.quarantineOf(parsed))
    assert(clean.count() + quarantine.count() === n)
    // ...and the split is a partition, not an overlap: is_clean is a
    // total boolean over the same single-scan projection.
    assert(parsed.filter(col("is_clean").isNull).count() === 0)
  }

  test("drift-vs-tear asymmetry: missing field parses as NULL (clean); torn line quarantines") {
    val (dir, _) = shard(Seq(
      """{"doc_id":1,"lang":"en"}""", // n_chars absent — additive drift
      """{"doc_id":2,"lang":"fr","n_chars":7}""",
      """{"doc_id":3"""))
    val (clean, quarantine) = Ingest.jsonl(spark, dir, schema)
    val rows = clean.orderBy("doc_id").collect()
    assert(rows.length === 2)
    assert(rows(0).getLong(0) === 1L && rows(0).isNullAt(2)) // NULL n_chars, still clean
    assert(quarantine.select("raw_line").collect().map(_.getString(0)).toSeq ===
      Seq("""{"doc_id":3"""))
  }

  test("type drift quarantines: a field whose TYPE contradicts the schema is not silently nulled") {
    val (dir, _) = shard(Seq(
      """{"doc_id":1,"lang":"en","n_chars":"lots"}""", // string where LONG declared
      """{"doc_id":2,"lang":"fr","n_chars":5}"""))
    val (clean, quarantine) = Ingest.jsonl(spark, dir, schema)
    assert(clean.select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(2L))
    assert(quarantine.count() === 1)
  }

  test("empty and whitespace lines quarantine — they are not records of the schema") {
    val (dir, _) = shard(Seq(good.head, "", "   ", good.last))
    val parsed = Ingest.parseJsonl(
      spark.read.textFile(dir).toDF("value"), "value", schema)
    assert(Ingest.cleanOf(parsed, schema).count() === 2)
    assert(Ingest.quarantineOf(parsed).count() === 2)
  }

  test("csv type-poison row quarantines WHOLE — no partially-nulled row reaches the corpus") {
    val (dir, _) = shard(Seq("1,en,10", "2,fr,xx", "3,de,30"), "shard.csv")
    val (clean, quarantine) = Ingest.csv(spark, dir, schema)
    assert(clean.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet ===
      Set((1L, "en", 10L), (3L, "de", 30L)))
    assert(quarantine.select("raw_line").collect().map(_.getString(0)).toSeq === Seq("2,fr,xx"))
  }

  test("csv wrong token count quarantines (no missing-field tolerance, unlike JSONL)") {
    val (dir, _) = shard(Seq("1,en,10", "2,fr"), "shard.csv")
    val (clean, quarantine) = Ingest.csv(spark, dir, schema)
    assert(clean.count() === 1)
    assert(quarantine.select("raw_line").head().getString(0) === "2,fr")
  }

  test("provenance: a torn line is traceable to its shard file and stably hashed") {
    val dir = Fixtures.scratchDir("graft-ingest-spec")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.jsonl"),
      (good :+ "torn-in-a").mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.jsonl"),
      """{"doc_id":9,"lang":"zh","n_chars":9}""".getBytes("UTF-8"))
    val (_, quarantine) = Ingest.jsonl(spark, dir, schema)
    val q = quarantine.collect()
    assert(q.length === 1)
    assert(q.head.getAs[String]("raw_line") === "torn-in-a")
    assert(q.head.getAs[String]("src_file").endsWith("/a.jsonl"))
    // line_hash is xxhash64 of the raw bytes — recomputable, stable
    // across re-ingests, usable as a dedup/ticket id.
    val expected = spark.sql("SELECT xxhash64('torn-in-a')").head().getLong(0)
    assert(q.head.getAs[Long]("line_hash") === expected)
  }

  test("shardLabel: partition-layout paths label by key=value segment, flat paths by basename") {
    val df = spark.range(1).select(
      Ingest.shardLabel(lit("/data/crawl/lang=en/part-0001.txt")).as("a"),
      Ingest.shardLabel(lit("/data/crawl/part-0042.jsonl.gz")).as("b"))
    assert(df.head() === Row("lang=en", "part-0042.jsonl.gz"))
  }

  test("quarantineTo: rejected lines persist partitioned by shard and replay verbatim") {
    val dir = Fixtures.scratchDir("graft-ingest-spec")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir, "in", "lang=en"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir, "in", "lang=fr"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "in/lang=en/p0.jsonl"),
      (good.take(1) :+ "torn-en-1" :+ "torn-en-2").mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "in/lang=fr/p0.jsonl"),
      (good.drop(1) :+ "torn-fr-1").mkString("\n").getBytes("UTF-8"))
    val parsed = Ingest.parseJsonl(
      spark.read.textFile(s"$dir/in").toDF("value"), "value", schema)
    Ingest.quarantineTo(parsed, s"$dir/sink")
    val back = spark.read.parquet(s"$dir/sink")
    assert(back.select("src_shard").distinct().collect().map(_.getString(0)).toSet ===
      Set("lang=en", "lang=fr"))
    // Partition pruning works and the raw bytes replay per shard.
    assert(back.filter(col("src_shard") === "lang=en")
      .select("raw_line").collect().map(_.getString(0)).toSet ===
      Set("torn-en-1", "torn-en-2"))
    assert(back.filter(col("src_shard") === "lang=fr")
      .select("raw_line").head().getString(0) === "torn-fr-1")
  }

  test("gzip shards read transparently; parallelism == shard count (non-splittable)") {
    val dir = Fixtures.scratchDir("graft-ingest-spec")
    def gzShard(name: String, lines: Seq[String]): Unit = {
      val out = new java.util.zip.GZIPOutputStream(
        java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(dir, name)))
      out.write(lines.mkString("\n").getBytes("UTF-8")); out.close()
    }
    gzShard("s0.jsonl.gz", good)
    gzShard("s1.jsonl.gz", torn)
    gzShard("s2.jsonl.gz", Seq("""{"doc_id":9,"lang":"zh","n_chars":9}"""))
    val lines = spark.read.textFile(dir).toDF("value")
    // One task per .gz shard — the codec is not splittable, so scan
    // parallelism equals shard count. (This is the 100 TB shard-size
    // discipline: many few-hundred-MB shards, never one archive.)
    assert(lines.rdd.getNumPartitions === 3)
    val parsed = Ingest.parseJsonl(lines, "value", schema)
    assert(Ingest.cleanOf(parsed, schema).count() === 3)
    assert(Ingest.quarantineOf(parsed).count() === 2)
  }

  private def warcRecord(id: Long, body: String, withUri: Boolean = true): String = {
    val crlf = "\r\n"
    s"WARC/1.0${crlf}WARC-Type: response${crlf}WARC-Record-ID: <urn:graft:$id>$crlf" +
      (if (withUri) s"WARC-Target-URI: http://example.org/doc/$id$crlf" else "") +
      s"${crlf}HTTP/1.1 200 OK${crlf}Content-Type: text/plain$crlf$crlf$body"
  }

  test("warc: clean/quarantine totality, payload byte-exact, provenance on rejects") {
    val dir = Fixtures.scratchDir("graft-warc-spec")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "s0.warc"),
      (warcRecord(1, "hello crawl") + "\n" + warcRecord(2, "bad", withUri = false) +
        "\n" + warcRecord(3, "final body, no trailing newline"))
        .getBytes("UTF-8"))
    val (clean, quarantine) = Ingest.warc(spark, dir)
    val rows = clean.orderBy("uri").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows === Array(
      ("http://example.org/doc/1", "200", "hello crawl"),
      ("http://example.org/doc/3", "200", "final body, no trailing newline")))
    val q = quarantine.collect()
    assert(q.length === 1)
    assert(q.head.getAs[String]("src_file").endsWith("s0.warc"))
    assert(!q.head.isNullAt(q.head.fieldIndex("line_hash")))
  }

  test("warc: a payload ending in newlines keeps them — only the row terminator strips") {
    val dir = Fixtures.scratchDir("graft-warc-spec-nl")
    // Written WITHOUT a trailing row terminator: the body's own "\n\n"
    // must round-trip; then WITH one extra "\n" (the text writer's row
    // terminator): exactly one strips.
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "s0.warc"),
      (warcRecord(1, "ends in blank lines\n\n") + "\n" +
        warcRecord(2, "no trailing newline")).getBytes("UTF-8"))
    val (clean, _) = Ingest.warc(spark, dir)
    val bodies = clean.orderBy("uri").collect().map(_.getAs[String]("body"))
    // Record 1 had the writer-style "\n" appended: body + "\n\n" + "\n"
    // → one strip leaves the payload's own two newlines.
    assert(bodies(0) === "ends in blank lines\n\n")
    assert(bodies(1) === "no trailing newline")
  }

  test("warc: a text payload containing CRLF blank lines survives byte-exact — second-blank-line framing, never tail-sliced") {
    val dir = Fixtures.scratchDir("graft-warc-spec-crlf")
    // Crawled CRLF-newline text routinely carries \r\n\r\n paragraph
    // breaks INSIDE the payload. The framing is structural (after the
    // SECOND blank line), so the body keeps every byte — the old
    // after-LAST-blank-line slice would have returned just "para three"
    // and still flagged the record clean: silent corruption.
    val body = "para one\r\n\r\npara two\r\n\r\npara three"
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "s0.warc"),
      (warcRecord(1, body) + "\n" + warcRecord(2, "plain")).getBytes("UTF-8"))
    val (clean, quarantine) = Ingest.warc(spark, dir)
    val bodies = clean.orderBy("uri").collect().map(_.getAs[String]("body"))
    assert(bodies === Array(body, "plain"))
    assert(quarantine.count() === 0L)
  }

  test("warc: the scan SPLITS inside one large shard file — no record torn at split boundaries") {
    val dir = Fixtures.scratchDir("graft-warc-spec-split")
    val recs = (1L to 400L).map(i => warcRecord(i, s"payload $i " + ("x" * 200)))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "big.warc"),
      recs.mkString("\n").getBytes("UTF-8"))
    val old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
      val lines = spark.read.option("lineSep", "WARC/1.0\r\n").text(dir)
        .toDF("value").filter(length(col("value")) > 0)
      // One file, MANY tasks — the property gzip shards lose — and the
      // record-delimiter reader reassembles every boundary-spanning
      // record: nothing quarantines, nothing duplicates.
      assert(lines.rdd.getNumPartitions > 1)
      val parsed = Ingest.parseWarc(lines, "value")
      assert(parsed.count() === 400L)
      assert(parsed.filter(!col("is_clean")).count() === 0L)
      assert(parsed.select("uri").distinct().count() === 400L)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", old)
  }

  test("warc: interim 1xx response blocks peel off — status and body come from the FINAL block") {
    val dir = Fixtures.scratchDir("graft-warc-spec-1xx")
    val crlf = "\r\n"
    // A capture carrying "100 Continue" (headers optional) before the
    // final response — RFC 7231 §6.2. The old framings either reported
    // status 100 or leaked "HTTP/1.1 200 OK…" header bytes into body.
    val rec1 = s"WARC/1.0${crlf}WARC-Type: response${crlf}" +
      s"WARC-Record-ID: <urn:graft:1>${crlf}" +
      s"WARC-Target-URI: http://example.org/doc/1$crlf$crlf" +
      s"HTTP/1.1 100 Continue$crlf$crlf" +
      s"HTTP/1.1 200 OK${crlf}Content-Type: text/plain$crlf${crlf}hello"
    // Two interims, one with its own header line — the star must peel both.
    val rec2 = s"WARC/1.0${crlf}WARC-Type: response${crlf}" +
      s"WARC-Record-ID: <urn:graft:2>${crlf}" +
      s"WARC-Target-URI: http://example.org/doc/2$crlf$crlf" +
      s"HTTP/1.1 100 Continue$crlf$crlf" +
      s"HTTP/1.1 103 Early Hints${crlf}Link: </style.css>$crlf$crlf" +
      s"HTTP/1.1 200 OK$crlf${crlf}para one$crlf${crlf}para two"
    // A 1xx-FINAL response (101 with no subsequent block — a WebSocket
    // upgrade capture): nothing follows, so nothing peels; the record
    // surfaces with ITS status instead of quarantining empty-status
    // (the r18 ADVICE hazard — the unguarded star ate the whole block).
    val rec3 = s"WARC/1.0${crlf}WARC-Type: response${crlf}" +
      s"WARC-Record-ID: <urn:graft:3>${crlf}" +
      s"WARC-Target-URI: http://example.org/doc/3$crlf$crlf" +
      s"HTTP/1.1 101 Switching Protocols${crlf}Upgrade: websocket$crlf$crlf"
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "s0.warc"),
      (rec1 + "\n" + rec2 + "\n" + rec3).getBytes("UTF-8"))
    val (clean, quarantine) = Ingest.warc(spark, dir)
    val rows = clean.orderBy("uri").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows === Array(
      ("http://example.org/doc/1", "200", "hello"),
      ("http://example.org/doc/2", "200", s"para one$crlf${crlf}para two"),
      ("http://example.org/doc/3", "101", "")))
    assert(quarantine.count() === 0L)
  }

  test("warc: gzipped shards decode transparently through the custom record delimiter; parallelism == shard count") {
    val dir = Fixtures.scratchDir("graft-warc-spec-gz")
    val recs = (1L to 40L).map(i => warcRecord(i, s"payload $i"))
    val bytes = recs.mkString("\n").getBytes("UTF-8")
    for (f <- Seq("a", "b")) {
      val out = new java.util.zip.GZIPOutputStream(
        new java.io.FileOutputStream(s"$dir/$f.warc.gz"))
      out.write(bytes); out.close()
    }
    val lines = spark.read.option("lineSep", "WARC/1.0\r\n").text(dir)
      .toDF("value").filter(length(col("value")) > 0)
    // gzip is NON-SPLITTABLE: one task per shard member (the C160
    // price — crawl trees should be many modest members), and every
    // record still parses clean through the codec.
    assert(lines.rdd.getNumPartitions === 2)
    val parsed = Ingest.parseWarc(lines, "value")
    assert(parsed.count() === 80L)
    assert(parsed.filter(!col("is_clean")).count() === 0L)
    val bodies = parsed.filter(col("uri") === "http://example.org/doc/7")
      .select("body").collect().map(_.getString(0))
    assert(bodies.toSeq === Seq("payload 7", "payload 7"))
  }

  test("warc: a payload line spelling the record header tears INTO QUARANTINE, never silently merges") {
    val dir = Fixtures.scratchDir("graft-warc-spec-tear")
    // The delimiter-collision limit, pinned honestly: a text payload
    // containing a literal WARC/1.0 version line reads as a bogus
    // record start; the tail has no headers, so it QUARANTINES (loud),
    // and the host record's body is truncated at the collision.
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "s0.warc"),
      warcRecord(1, "evil body\nWARC/1.0\r\nnot a real record").getBytes("UTF-8"))
    val (clean, quarantine) = Ingest.warc(spark, dir)
    assert(clean.select("body").head().getString(0) === "evil body")
    assert(quarantine.count() === 1L)
  }

  test("embedded-newline CSV: the line-oriented reader tears (pinned); csvMultiline parses intact") {
    val record = "5,en,\"hello\nworld\"" // ONE logical record, two physical lines
    val (dir, _) = shard(Seq("1,en,10", record), "shard.csv")
    // Pinned tear shape: the head fragment parses CLEAN with the field
    // silently truncated at the dangling quote; the tail fragment
    // quarantines (it violates the numeric leading column). This is WHY
    // quote-newline shards must not go through the line-oriented path —
    // the quarantine count is the canary, not a guarantee.
    val csvSchemaStr = new StructType()
      .add("doc_id", LongType).add("lang", StringType).add("text", StringType)
    val (clean, quarantine) = Ingest.csv(spark, dir, csvSchemaStr)
    assert(clean.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(2))).toSeq ===
      Seq((1L, "10"), (5L, "hello"))) // truncated!
    assert(quarantine.select("raw_line").head().getString(0) === "world\"")
    // The quote-aware path returns the record intact.
    val (mClean, mQuarantine) = Ingest.csvMultiline(spark, dir, csvSchemaStr)
    assert(mClean.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(2))).toSeq ===
      Seq((1L, "10"), (5L, "hello\nworld")))
    assert(mQuarantine.count() === 0)
  }

  test("csvMultiline quarantines malformed records with the raw record preserved") {
    val (dir, _) = shard(Seq("1,en,10", "2,fr,xx", "3,de,30"), "shard.csv")
    val (clean, quarantine) = Ingest.csvMultiline(spark, dir, schema)
    assert(clean.select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L, 3L))
    val q = quarantine.collect()
    assert(q.length === 1 && q.head.getAs[String]("raw_line") === "2,fr,xx")
    assert(q.head.getAs[String]("src_file").endsWith("shard.csv"))
  }

  test("report: one-row totality gate with 6dp corrupt fraction") {
    val (dir, _) = shard(good ++ torn)
    val parsed = Ingest.parseJsonl(
      spark.read.textFile(dir).toDF("value"), "value", schema)
    assert(Ingest.report(parsed).head() === Row(2L, 2L, 0.5))
  }

  test("replayQuarantine: corrected schema recovers; still-bad keeps raw bytes + provenance; totality") {
    val dir = Fixtures.scratchDir("graft-ingest-spec")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir, "in"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "in/s.jsonl"), Seq(
      """{"doc_id":1,"lang":"en","n_chars":10}""",
      """{"doc_id":2,"lang":"fr","n_chars":"20c"}""", // type drift — strict rejects
      "utterly torn" // no schema will fix this
    ).mkString("\n").getBytes("UTF-8"))
    val parsed = Ingest.parseJsonl(
      spark.read.textFile(s"$dir/in").toDF("value"), "value", schema)
    Ingest.quarantineTo(parsed, s"$dir/q")
    val q = spark.read.parquet(s"$dir/q")
    assert(q.count() === 2)
    val tolerant = new StructType()
      .add("doc_id", LongType).add("lang", StringType).add("n_chars", StringType)
    val (recovered, stillBad) = Ingest.replayQuarantine(q, tolerant)
    assert(recovered.collect().map(r => (r.getLong(0), r.getString(2))).toSeq ===
      Seq((2L, "20c")))
    val bad = stillBad.collect()
    assert(bad.length === 1 && recovered.count() + stillBad.count() === q.count())
    assert(bad.head.getAs[String]("raw_line") === "utterly torn")
    // Provenance survives the replay round-trip: the still-bad row goes
    // BACK to quarantine with its original shard attribution intact.
    assert(bad.head.getAs[String]("src_file").endsWith("s.jsonl"))
    assert(stillBad.columns.toSet === q.columns.toSet)
  }

  test("fieldInventory: top-level keys only, torn lines excluded, fractions over ALL lines") {
    val (dir, _) = shard(Seq(
      """{"a":1,"b":{"nested":true}}""",
      """{"a":2,"c":3}""",
      "torn — contributes to the denominator, no fields",
      """{"a":4}"""))
    val inv = Ingest.fieldInventory(
        spark.read.textFile(dir).toDF("value"), "value")
      .orderBy("field").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // `nested` must NOT appear (presence is a top-level question); the
    // torn line appears in no field count but in every fraction's
    // denominator (4 lines).
    assert(inv.toSeq === Seq(("a", 3L, 0.75), ("b", 1L, 0.25), ("c", 1L, 0.25)))
  }

  test("compactCorpus: per-file src_key dirs replaced by plain parquet, rows and provenance intact") {
    val dir = Fixtures.scratchDir("graft-ingest-spec")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir, "in"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "in/a.jsonl"),
      (good :+ "torn-a").mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "in/b.jsonl"),
      """{"doc_id":9,"lang":"zh","n_chars":9}""".getBytes("UTF-8"))
    Ingest.promoteJsonl(spark, s"$dir/in", schema,
      s"$dir/corpus", s"$dir/q", s"$dir/m").count()
    Ingest.compactCorpus(spark, s"$dir/corpus", s"$dir/compact")
    val out = spark.read.parquet(s"$dir/compact")
    assert(out.columns.toSet === Set("doc_id", "lang", "n_chars", "src_shard"))
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L, 9L))
    // The compacted layout has no per-file partition dirs.
    assert(!new java.io.File(s"$dir/compact").listFiles()
      .exists(_.getName.startsWith("src_key=")))
  }

  test("corruptWhen poisons JSONL unconditionally and numeric-leading CSV") {
    val df = spark.createDataFrame(java.util.List.of(
        Row(1L, """{"doc_id":1,"lang":"en","n_chars":5}"""),
        Row(2L, """{"doc_id":2,"lang":"fr","n_chars":6}""")),
      new StructType().add("id", LongType).add("value", StringType))
      .select(Ingest.corruptWhen(col("id") === 1L, col("value")).as("value"))
    val parsed = Ingest.parseJsonl(df, "value", schema)
    assert(Ingest.cleanOf(parsed, schema).count() === 1)
    assert(Ingest.quarantineOf(parsed).select("raw_line").head().getString(0)
      .startsWith("\u0000###"))
    // CSV: the NUL prefix breaks a LONG leading column (the csvFixture
    // shape); a string-leading CSV schema would accept it — fixtures
    // that poison CSV must poison a typed token (Ingest scaladoc).
    val csvDf = spark.createDataFrame(java.util.List.of(Row(1L, "1,en,10")),
      new StructType().add("id", LongType).add("value", StringType))
      .select(Ingest.corruptWhen(col("id") === 1L, col("value")).as("value"))
    assert(Ingest.quarantineOf(Ingest.parseCsv(csvDf, "value", schema)).count() === 1)
  }
}
