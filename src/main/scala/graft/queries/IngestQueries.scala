package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}

import graft.sources.Ingest

/** The ingestion-boundary queries (j-family): JSONL/CSV shards with
  * deterministic planted damage, read back through
  * [[graft.sources.Ingest]]'s quarantine readers. The fixture discipline
  * is t17/t27's: the driver's `documents` table is serialized to the
  * line format IN SPARK (so the oracle can replay the damage rule as
  * plain SQL over `documents`), a deterministic subset of lines is
  * corrupted, and the files round-trip through a real `text`-source
  * scan — the split/parse path a 100 TB crawl ingest actually
  * exercises, not an in-memory shortcut.
  */
object IngestQueries {

  import Fixtures.table

  /** JSONL schema under test (subset of documents; `text` rides along so
    * the payload is realistic, including JSON-escaped content). */
  private[graft] def jsonlSchema: StructType = new StructType()
    .add("doc_id", LongType).add("lang", StringType)
    .add("n_chars", LongType).add("text", StringType)

  /** Serialize documents to JSONL, corrupt every 13th line (prefix
    * damage — invalid JSON regardless of payload), write as text files,
    * return the shard path. Untimed setup for the bench phases.
    * `nFiles` > 0 forces that many shard files (the streaming harness
    * stages one file per micro-batch; 0 keeps the source layout).
    */
  private[graft] def jsonlFixture(s: SparkSession, dir: String, nFiles: Int = 0): String = {
    val path = Fixtures.scratchDir("graft-jsonl") + "/shard"
    val serialized = table(s, dir, "documents")
      .select(col("doc_id"),
        to_json(struct(col("doc_id"), col("lang"), col("n_chars"), col("text")))
          .as("value"))
      .select(Ingest.corruptWhen(col("doc_id") % 13 === 0, col("value")).as("value"))
    val sharded = if (nFiles > 0) serialized.repartition(nFiles) else serialized
    sharded.write.mode("overwrite").text(path)
    path
  }

  /** The lang-partitioned twin of [[jsonlFixture]]: shards laid out as
    * `lang=XX/part-*.txt` — the directory-partitioned crawl layout —
    * with the same every-13th-line damage. The quarantine's
    * `input_file_name()` provenance recovers the shard key from the
    * path, which is what j5/j7's per-shard corrupt counts assert.
    */
  private[graft] def partitionedJsonlFixture(s: SparkSession, dir: String): String = {
    val path = Fixtures.scratchDir("graft-jsonl-bylang") + "/shard"
    table(s, dir, "documents")
      .select(col("lang"), col("doc_id"),
        to_json(struct(col("doc_id"), col("lang"), col("n_chars"), col("text")))
          .as("value"))
      .select(col("lang"),
        Ingest.corruptWhen(col("doc_id") % 13 === 0, col("value")).as("value"))
      .write.mode("overwrite").partitionBy("lang").text(path)
    path
  }

  /** Gzipped twin of [[jsonlFixture]]: 4 `.gz` shards through the same
    * reader — the compressed-shard contract (codec decode is transparent;
    * parallelism == shard count because gzip is non-splittable, pinned
    * by `IngestSpec`).
    */
  private[graft] def gzipFixture(s: SparkSession, dir: String): String = {
    val path = Fixtures.scratchDir("graft-jsonl-gz") + "/shard"
    table(s, dir, "documents")
      .select(col("doc_id"),
        to_json(struct(col("doc_id"), col("lang"), col("n_chars"), col("text")))
          .as("value"))
      .select(Ingest.corruptWhen(col("doc_id") % 13 === 0, col("value")).as("value"))
      .repartition(4)
      .write.mode("overwrite").option("compression", "gzip").text(path)
    path
  }

  /** Two JSONL shards with drifted schemas: odd docs predate the
    * `quality` field, even docs carry it — additive schema evolution,
    * the routine kind. Both land under one root; the wide-schema read
    * must surface old rows with NULL quality, not quarantine them.
    * `n_chars` is coalesced so a NULL can never silently drop the
    * `quality` key from the serialized JSON (to_json omits null fields
    * by default) and break the fixture/oracle pairing.
    */
  private[graft] def driftFixture(s: SparkSession, dir: String): String = {
    val root = Fixtures.scratchDir("graft-jsonl-drift")
    val docs = table(s, dir, "documents")
    docs.filter(col("doc_id") % 2 === 1)
      .select(to_json(struct(col("doc_id"), col("text"))).as("value"))
      .write.mode("overwrite").text(s"$root/old")
    docs.filter(col("doc_id") % 2 === 0)
      .select(to_json(struct(col("doc_id"), col("text"),
        round(coalesce(col("n_chars"), lit(0L)) / 1000.0, 6).as("quality"))).as("value"))
      .write.mode("overwrite").text(s"$root/new")
    root
  }

  /** WARC shards (ISO 28500, the CommonCrawl container): every document
    * as a `response` record — WARC header block, HTTP response block,
    * text payload, CRLF-framed, with a real Content-Length (the HTTP
    * block's 45 bytes + the payload octets). Every 17th record loses
    * its WARC-Target-URI header line — the truncated-header damage a
    * crawl dump actually carries. Each row leads with its own
    * `WARC/1.0\r\n` version line, so every part file is a standalone
    * valid WARC shard and the custom-lineSep read splits on it.
    */
  private[graft] def warcFixture(s: SparkSession, dir: String, nFiles: Int = 0): String = {
    val path = Fixtures.scratchDir("graft-warc") + "/shard"
    val crlf = "\r\n"
    val serialized = table(s, dir, "documents")
      .select(concat(
        lit("WARC/1.0" + crlf),
        lit("WARC-Type: response" + crlf),
        concat(lit("WARC-Record-ID: <urn:graft:"), col("doc_id"), lit(">" + crlf)),
        when(col("doc_id") % 17 === 0, lit(""))
          .otherwise(concat(lit("WARC-Target-URI: http://example.org/doc/"),
            col("doc_id"), lit(crlf))),
        concat(lit("Content-Length: "),
          (lit(45L) + octet_length(col("text"))).cast("string"), lit(crlf)),
        lit(crlf),
        lit("HTTP/1.1 200 OK" + crlf + "Content-Type: text/plain" + crlf + crlf),
        col("text")).as("value"))
    val sharded = if (nFiles > 0) serialized.repartition(nFiles) else serialized
    sharded.write.mode("overwrite").text(path)
    path
  }

  /** [[warcFixture]] with CRLF-newline text payloads: every space in
    * the text becomes a CRLF BLANK LINE (`\r\n\r\n`) — the crawled-text
    * shape that the old after-LAST-blank-line framing silently
    * truncated to its tail. Content-Length recomputed for the expanded
    * payload; same every-17th header damage.
    */
  private[graft] def warcCrlfFixture(s: SparkSession, dir: String): String = {
    val path = Fixtures.scratchDir("graft-warc-crlf") + "/shard"
    val crlf = "\r\n"
    val body = regexp_replace(col("text"), " ", crlf + crlf)
    table(s, dir, "documents")
      .select(concat(
        lit("WARC/1.0" + crlf),
        lit("WARC-Type: response" + crlf),
        concat(lit("WARC-Record-ID: <urn:graft:"), col("doc_id"), lit(">" + crlf)),
        when(col("doc_id") % 17 === 0, lit(""))
          .otherwise(concat(lit("WARC-Target-URI: http://example.org/doc/"),
            col("doc_id"), lit(crlf))),
        concat(lit("Content-Length: "),
          (lit(45L) + octet_length(body)).cast("string"), lit(crlf)),
        lit(crlf),
        lit("HTTP/1.1 200 OK" + crlf + "Content-Type: text/plain" + crlf + crlf),
        body).as("value"))
      .write.mode("overwrite").text(path)
    path
  }

  /** Gzipped twin of [[warcFixture]]: 4 `.gz` WARC shards — the
    * compressed-crawl contract. CommonCrawl ships gzip; Hadoop's codec
    * decode is transparent THROUGH the custom record delimiter, at the
    * C160 price: gzip is non-splittable, so parallelism is the shard
    * count (pinned in IngestSpec), not byte splits — which is why the
    * shard tree should be many few-hundred-MB members.
    */
  private[graft] def warcGzipFixture(s: SparkSession, dir: String): String = {
    val path = Fixtures.scratchDir("graft-warc-gz") + "/shard"
    val crlf = "\r\n"
    table(s, dir, "documents")
      .select(concat(
        lit("WARC/1.0" + crlf),
        lit("WARC-Type: response" + crlf),
        concat(lit("WARC-Record-ID: <urn:graft:"), col("doc_id"), lit(">" + crlf)),
        when(col("doc_id") % 17 === 0, lit(""))
          .otherwise(concat(lit("WARC-Target-URI: http://example.org/doc/"),
            col("doc_id"), lit(crlf))),
        concat(lit("Content-Length: "),
          (lit(45L) + octet_length(col("text"))).cast("string"), lit(crlf)),
        lit(crlf),
        lit("HTTP/1.1 200 OK" + crlf + "Content-Type: text/plain" + crlf + crlf),
        col("text")).as("value"))
      .repartition(4)
      .write.mode("overwrite").option("compression", "gzip").text(path)
    path
  }

  /** One HTML-chrome WARC response record (shared by the crawl
    * fixtures): headers + a 200 response whose payload is `text`
    * wrapped in the t17 markup chrome — the strip stage has real work.
    */
  private def crawlRec(
      idCol: org.apache.spark.sql.Column,
      text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val crlf = "\r\n"
    val body = concat(lit("<html><body class=\"c\"><p>"), text,
      lit("</p></body></html>"))
    concat(
      lit("WARC/1.0" + crlf),
      lit("WARC-Type: response" + crlf),
      concat(lit("WARC-Record-ID: <urn:graft:"), idCol, lit(">" + crlf)),
      concat(lit("WARC-Target-URI: http://example.org/doc/"), idCol, lit(crlf)),
      concat(lit("Content-Length: "),
        (lit(45L) + octet_length(body)).cast("string"), lit(crlf)),
      lit(crlf),
      lit("HTTP/1.1 200 OK" + crlf + "Content-Type: text/html" + crlf + crlf),
      body)
  }

  /** The p11 crawl fixture: every document as a WARC response record
    * with HTML-chrome payload ([[crawlRec]]), plus a planted MIRROR
    * record (uri `/doc/&lt;id+700000&gt;`, identical payload) for every
    * 10th document — the republication duplicate the dedup stage
    * exists to collapse. No header damage here: quarantine totality is
    * j13/j14's cell; p11's claim is the COMPOSITION.
    */
  private[graft] def warcCrawlFixture(s: SparkSession, dir: String): String = {
    val path = Fixtures.scratchDir("graft-warc-crawl") + "/shard"
    val d = table(s, dir, "documents")
    d.select(crawlRec(col("doc_id"), col("text")).as("value"))
      .unionByName(d.filter(col("doc_id") % 10 === 0)
        .select(crawlRec(col("doc_id") + 700000, col("text")).as("value")))
      .write.mode("overwrite").text(path)
    path
  }

  /** [[warcCrawlFixture]] plus planted NEAR-mirror records for every
    * 25th document (uri `/doc/&lt;id+800000&gt;`, payload = the text
    * with a ` zq zq zq` boilerplate tail — the d2 plant convention):
    * these SURVIVE exact dedup (different fingerprint) and exist for
    * the near-dup prune stage the scale pipeline (p13) adds. Exact
    * mirrors stay planted too — a real crawl carries both kinds.
    */
  private[graft] def warcCrawlNearFixture(s: SparkSession, dir: String): String = {
    val path = Fixtures.scratchDir("graft-warc-crawl-near") + "/shard"
    val d = table(s, dir, "documents")
    d.select(crawlRec(col("doc_id"), col("text")).as("value"))
      .unionByName(d.filter(col("doc_id") % 10 === 0)
        .select(crawlRec(col("doc_id") + 700000, col("text")).as("value")))
      .unionByName(d.filter(col("doc_id") % 25 === 0)
        .select(crawlRec(col("doc_id") + 800000,
          concat(col("text"), lit(" zq zq zq"))).as("value")))
      .write.mode("overwrite").text(path)
    path
  }

  /** CSV shard (no header): doc_id,lang,source,n_chars — every 11th row
    * carries a type-contradicting token ('xx' where the schema says
    * BIGINT), the classic silent-poison row PERMISSIVE+quarantine must
    * catch rather than null-out or crash on.
    */
  private[graft] def csvFixture(s: SparkSession, dir: String): String = {
    val path = Fixtures.scratchDir("graft-csv") + "/shard"
    table(s, dir, "documents")
      .select(concat_ws(",",
        col("doc_id"), col("lang"), col("source"),
        when(col("doc_id") % 11 === 0, lit("xx"))
          .otherwise(col("n_chars").cast("string"))).as("value"))
      .write.mode("overwrite").text(path)
    path
  }

  /** CSV with embedded newlines: every 7th doc's text has its spaces
    * replaced by literal newlines, then the row is serialized with
    * `to_csv` (which quotes the field). Written through the text sink
    * the embedded newlines land raw in the file — a legitimate
    * quote-aware CSV shard that the line-oriented reader would tear
    * (IngestSpec pins the truncated-head + quarantined-tail shape) and
    * [[Ingest.csvMultiline]] must parse intact.
    */
  private[graft] def multilineCsvFixture(s: SparkSession, dir: String): String = {
    val path = Fixtures.scratchDir("graft-csv-ml") + "/shard"
    table(s, dir, "documents")
      .select(to_csv(struct(col("doc_id"), col("lang"),
        when(col("doc_id") % 7 === 0, regexp_replace(col("text"), " ", "\n"))
          .otherwise(col("text")).as("text"))).as("value"))
      .coalesce(1)
      .write.mode("overwrite").text(path)
    path
  }

  /** JSONL where every 9th doc's n_chars arrives as a STRING with a
    * unit suffix ("123c") — the upstream-format surprise that poisons a
    * LONG read schema. Under the strict schema those lines quarantine
    * whole (j12's setup); replayed under a tolerant string schema they
    * recover losslessly.
    */
  private[graft] def typeDriftFixture(s: SparkSession, dir: String): String = {
    val path = Fixtures.scratchDir("graft-jsonl-typedrift") + "/shard"
    val docs = table(s, dir, "documents")
    val strict = docs.filter(col("doc_id") % 9 =!= 0)
      .select(to_json(struct(col("doc_id"), col("lang"), col("n_chars"))).as("value"))
    val drifted = docs.filter(col("doc_id") % 9 === 0)
      .select(to_json(struct(col("doc_id"), col("lang"),
        concat(col("n_chars").cast("string"), lit("c")).as("n_chars"))).as("value"))
    strict.unionByName(drifted).write.mode("overwrite").text(path)
    path
  }

  private[graft] def csvSchema: StructType = new StructType()
    .add("doc_id", LongType).add("lang", StringType)
    .add("source", StringType).add("n_chars", LongType)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Clean-side contract: every undamaged line parses to typed columns;
    // every damaged line is absent (quarantined, not nulled into the
    // corpus). Map-only — one text scan, no shuffle before the sort.
    "j1_jsonl_ingest" -> ((s, dir) => {
      val (clean, _) = Ingest.jsonl(s, jsonlFixture(s, dir), jsonlSchema)
      clean.select("doc_id", "lang", "n_chars").orderBy("doc_id")
    }),
    // Quarantine-side contract: totality. n_clean + n_corrupt covers
    // every input line; the raw damaged lines are preserved verbatim
    // (asserted by IngestSpec; the oracle checks the counts).
    "j2_jsonl_quarantine" -> ((s, dir) => {
      val parsed = Ingest.parseJsonl(
        s.read.textFile(jsonlFixture(s, dir)).toDF("value"), "value", jsonlSchema)
      Ingest.report(parsed)
    }),
    // Additive schema drift: old shards (no `quality` field) read as
    // NULL under the wide schema — clean, not corrupt. The asymmetry
    // that matters: missing field tolerated, torn line quarantined.
    "j3_jsonl_schema_drift" -> ((s, dir) => {
      val wide = new StructType()
        .add("doc_id", LongType).add("text", StringType).add("quality", DoubleType)
      val (clean, _) = Ingest.jsonl(s, driftFixture(s, dir) + "/*", wide)
      clean.select(col("doc_id"), col("quality").isNotNull.as("has_quality"),
          round(col("quality"), 6).as("quality"))
        .orderBy("doc_id")
    }),
    // CSV with a type-contradicting token: the row quarantines whole —
    // no partial nulled row enters the corpus, n_chars stays trustworthy
    // for every surviving row.
    "j4_csv_quarantine" -> ((s, dir) => {
      val (clean, _) = Ingest.csv(s, csvFixture(s, dir), csvSchema)
      clean.select("doc_id", "lang", "source", "n_chars").orderBy("doc_id")
    }),
    // Quarantine provenance: every rejected line carries its shard of
    // origin (input_file_name) and a stable content hash. Per-shard
    // corrupt counts — the shard-health triage view — come straight off
    // the quarantine frame; n_distinct == n_corrupt pins that the line
    // hashes are usable as ids (no planted line collides).
    "j5_quarantine_provenance" -> ((s, dir) => {
      val parsed = Ingest.parseJsonl(
        s.read.textFile(partitionedJsonlFixture(s, dir)).toDF("value"),
        "value", jsonlSchema)
      Ingest.quarantineOf(parsed)
        .groupBy(regexp_extract(col("src_file"), "lang=([^/]+)", 1).as("lang"))
        .agg(count(lit(1)).as("n_corrupt"),
          countDistinct(col("line_hash")).as("n_distinct"))
        .orderBy("lang")
    }),
    // Compressed shards: the identical damage through 4 gzip shards —
    // decode is transparent, quarantine totality unchanged. (The
    // non-splittable parallelism contract is pinned in IngestSpec.)
    "j6_gzip_ingest" -> ((s, dir) => {
      val parsed = Ingest.parseJsonl(
        s.read.textFile(gzipFixture(s, dir)).toDF("value"), "value", jsonlSchema)
      Ingest.report(parsed)
    }),
    // Persisted quarantine: rejected lines land in a parquet sink
    // partitioned by source shard (the audit trail a crawl keeps next to
    // the corpus it promoted). Reading per-shard counts back off the
    // SINK proves the partition layout carries the provenance.
    "j7_quarantine_sink" -> ((s, dir) => {
      val parsed = Ingest.parseJsonl(
        s.read.textFile(partitionedJsonlFixture(s, dir)).toDF("value"),
        "value", jsonlSchema)
      val sink = Fixtures.scratchDir("graft-quarantine") + "/q"
      Ingest.quarantineTo(parsed, sink)
      s.read.parquet(sink)
        .groupBy(regexp_extract(col("src_shard"), "^lang=(.+)$", 1).as("lang"))
        .agg(count(lit(1)).as("n_corrupt"))
        .orderBy("lang")
    }),
    // Manifest-gated idempotent promotion: the shard tree promotes into
    // the per-file-partitioned corpus TWICE — the second run must no-op
    // off the manifest — and the corpus must hold exactly the clean
    // lines once. The end state is j1's (one damage rule); the
    // crash-recovery laws behind it are PromoteSpec's.
    "j9_shard_promote" -> ((s, dir) => {
      val src = partitionedJsonlFixture(s, dir)
      val root = Fixtures.scratchDir("graft-promote")
      Ingest.promoteJsonl(s, src, jsonlSchema,
        s"$root/corpus", s"$root/quarantine", s"$root/manifest").count()
      Ingest.promoteJsonl(s, src, jsonlSchema,
        s"$root/corpus", s"$root/quarantine", s"$root/manifest").count()
      s.read.parquet(s"$root/corpus")
        .select("doc_id", "lang", "n_chars").orderBy("doc_id")
    }),
    // Quote-aware CSV: fields with embedded newlines round-trip through
    // the multiLine reader — the documented non-splittable escape hatch
    // for shards the line-oriented reader would tear.
    "j8_csv_multiline" -> ((s, dir) => {
      val schema = new StructType()
        .add("doc_id", LongType).add("lang", StringType).add("text", StringType)
      val (clean, _) = Ingest.csvMultiline(s, multilineCsvFixture(s, dir), schema)
      clean.select("doc_id", "lang", "text").orderBy("doc_id")
    }),
    // Quarantine replay: the lifecycle closure. Strict read quarantines
    // the type-drifted lines (persisted with provenance); the corrected
    // schema replays the SINK and recovers every one losslessly — the
    // reason rejects are kept as raw bytes instead of dropped.
    "j12_quarantine_replay" -> ((s, dir) => {
      val strictSchema = new StructType()
        .add("doc_id", LongType).add("lang", StringType).add("n_chars", LongType)
      val parsed = Ingest.parseJsonl(
        s.read.textFile(typeDriftFixture(s, dir)).toDF("value"), "value", strictSchema)
      val sink = Fixtures.scratchDir("graft-replay") + "/q"
      Ingest.quarantineTo(parsed, sink)
      val tolerant = new StructType()
        .add("doc_id", LongType).add("lang", StringType).add("n_chars", StringType)
      val (recovered, stillBad) = Ingest.replayQuarantine(s.read.parquet(sink), tolerant)
      // The corrected parse: strip the unit suffix back to the number.
      recovered.select(col("doc_id"), col("lang"),
          regexp_extract(col("n_chars"), "^([0-9]+)", 1).cast("long").as("n_chars"),
          lit(stillBad.isEmpty).as("replay_complete"))
        .orderBy("doc_id")
    }),
    // WARC ingest (C198 / j13): the CommonCrawl container through ONE
    // custom-record-delimiter text scan (splits inside shard files) —
    // clean response records come back (uri, http_status, body) with
    // the payload byte-exact through the CRLF framing; records with the
    // planted truncated header quarantine whole.
    "j13_warc_ingest" -> ((s, dir) => {
      val (clean, _) = Ingest.warc(s, warcFixture(s, dir))
      clean.orderBy("uri")
    }),
    // WARC quarantine totality: clean + corrupt covers every record;
    // the damage rate replays exactly (the j2 contract on the new
    // container).
    "j14_warc_quarantine" -> ((s, dir) => {
      val recs = s.read.option("lineSep", "WARC/1.0\r\n")
        .text(warcFixture(s, dir)).toDF("value")
        .filter(length(col("value")) > 0)
      Ingest.report(Ingest.parseWarc(recs, "value"))
    }),
    // WARC with CRLF-newline payloads (j15): text bodies carrying
    // internal \r\n\r\n paragraph breaks survive byte-exact through
    // the SECOND-blank-line structural framing — the cell that pins
    // the r17 ADVICE fix (the old after-LAST-blank-line slice returned
    // just the final paragraph while still flagging is_clean).
    "j15_warc_crlf_body" -> ((s, dir) => {
      val (clean, _) = Ingest.warc(s, warcCrlfFixture(s, dir))
      clean.orderBy("uri")
    }),
    // Gzipped WARC (j16): the same container through 4 .gz shards —
    // codec decode is transparent through the custom record delimiter,
    // quarantine totality unchanged; j13's oracle verbatim. The
    // non-splittable parallelism price (tasks == shards) is pinned in
    // IngestSpec.
    "j16_warc_gzip" -> ((s, dir) => {
      val (clean, _) = Ingest.warc(s, warcGzipFixture(s, dir))
      clean.orderBy("uri")
    }),
    // Schema-drift inventory: per-field presence over the drifted shard
    // tree, BEFORE committing to a read schema — `quality` present in
    // exactly the new shards, doc_id/text everywhere. No schema input;
    // the inventory discovers one.
    "j10_field_inventory" -> ((s, dir) => {
      val lines = s.read.textFile(driftFixture(s, dir) + "/*").toDF("value")
      Ingest.fieldInventory(lines, "value").orderBy("field")
    }),
    // Compaction: the promoted per-file-partitioned corpus rewritten
    // into the coarse downstream layout — identical rows (j9's oracle
    // modulo the retained provenance column), no src_key dirs.
    "j11_compact_corpus" -> ((s, dir) => {
      val src = partitionedJsonlFixture(s, dir)
      val root = Fixtures.scratchDir("graft-compact")
      Ingest.promoteJsonl(s, src, jsonlSchema,
        s"$root/corpus", s"$root/quarantine", s"$root/manifest").count()
      Ingest.compactCorpus(s, s"$root/corpus", s"$root/compact")
      s.read.parquet(s"$root/compact")
        .select("doc_id", "lang", "n_chars", "src_shard").orderBy("doc_id")
    }))

  val oracleSql: Map[String, String] = Map(
    // j1: the damage rule replays as WHERE doc_id % 13 <> 0 — prefix
    // corruption makes the whole line unparseable, so the clean side is
    // exactly the undamaged subset.
    "j1_jsonl_ingest" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id % 13 <> 0 ORDER BY doc_id""".stripMargin,
    "j2_jsonl_quarantine" ->
      """SELECT count(*) FILTER (WHERE doc_id % 13 <> 0) AS n_clean,
        |       count(*) FILTER (WHERE doc_id % 13 = 0) AS n_corrupt,
        |       round(count(*) FILTER (WHERE doc_id % 13 = 0)
        |             / CAST(count(*) AS DOUBLE), 6) AS corrupt_frac
        |FROM documents""".stripMargin,
    "j3_jsonl_schema_drift" ->
      """SELECT doc_id,
        |       (doc_id % 2 = 0) AS has_quality,
        |       CASE WHEN doc_id % 2 = 0
        |            THEN round(round(coalesce(n_chars, 0) / CAST(1000 AS DOUBLE), 6), 6)
        |       END AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,
    "j4_csv_quarantine" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id % 11 <> 0 ORDER BY doc_id""".stripMargin,
    // j5/j7: the per-shard damage replays per lang — the shard key IS
    // the lang partition, so provenance recovered from the file path
    // must reproduce the per-lang corrupt histogram exactly.
    "j5_quarantine_provenance" ->
      """SELECT lang, count(*) AS n_corrupt, count(*) AS n_distinct
        |FROM documents WHERE doc_id % 13 = 0
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "j6_gzip_ingest" ->
      """SELECT count(*) FILTER (WHERE doc_id % 13 <> 0) AS n_clean,
        |       count(*) FILTER (WHERE doc_id % 13 = 0) AS n_corrupt,
        |       round(count(*) FILTER (WHERE doc_id % 13 = 0)
        |             / CAST(count(*) AS DOUBLE), 6) AS corrupt_frac
        |FROM documents""".stripMargin,
    "j7_quarantine_sink" ->
      """SELECT lang, count(*) AS n_corrupt
        |FROM documents WHERE doc_id % 13 = 0
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // j9: the double promote converges to the clean subset exactly once
    // — j1's damage rule; duplicates (a broken no-op) or losses (a
    // clobbered partition) would break the hash.
    "j9_shard_promote" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id % 13 <> 0 ORDER BY doc_id""".stripMargin,
    // j8: the embedded-newline transform replays as replace(' ', \n);
    // the quote-aware reader must return every row (nothing quarantines)
    // with the multi-line text intact.
    "j8_csv_multiline" ->
      """SELECT doc_id, lang,
        |       CASE WHEN doc_id % 7 = 0 THEN replace(text, ' ', chr(10))
        |            ELSE text END AS text
        |FROM documents ORDER BY doc_id""".stripMargin,
    // j12: the recovered set is exactly the type-drifted ninth, numbers
    // restored; replay_complete pins that nothing stayed bad.
    // j13/j14: the WARC damage rule replays closed-form — undamaged
    // docs round-trip (uri, status, payload); every 17th quarantines.
    "j13_warc_ingest" ->
      """SELECT 'http://example.org/doc/' || doc_id AS uri,
        |       '200' AS http_status, text AS body
        |FROM documents WHERE doc_id % 17 <> 0 ORDER BY uri""".stripMargin,
    "j14_warc_quarantine" ->
      """SELECT count(*) FILTER (WHERE doc_id % 17 <> 0) AS n_clean,
        |       count(*) FILTER (WHERE doc_id % 17 = 0) AS n_corrupt,
        |       round(count(*) FILTER (WHERE doc_id % 17 = 0)
        |             / CAST(count(*) AS DOUBLE), 6) AS corrupt_frac
        |FROM documents""".stripMargin,
    // j15: the CRLF-payload transform replays as replace(' ', CRLF
    // blank line); the structural framing must return it byte-exact.
    "j15_warc_crlf_body" ->
      """SELECT 'http://example.org/doc/' || doc_id AS uri,
        |       '200' AS http_status,
        |       replace(text, ' ', chr(13)||chr(10)||chr(13)||chr(10)) AS body
        |FROM documents WHERE doc_id % 17 <> 0 ORDER BY uri""".stripMargin,
    // j16: codec decode is content-transparent — j13's oracle verbatim.
    "j16_warc_gzip" ->
      """SELECT 'http://example.org/doc/' || doc_id AS uri,
        |       '200' AS http_status, text AS body
        |FROM documents WHERE doc_id % 17 <> 0 ORDER BY uri""".stripMargin,
    "j12_quarantine_replay" ->
      """SELECT doc_id, lang, n_chars, true AS replay_complete
        |FROM documents WHERE doc_id % 9 = 0 ORDER BY doc_id""".stripMargin,
    // j10: the drift fixture's field layout replays closed-form —
    // doc_id/text on every line, quality on the even (new-shard) half.
    "j10_field_inventory" ->
      """SELECT field, n_docs,
        |       round(n_docs / CAST((SELECT count(*) FROM documents) AS DOUBLE), 6)
        |         AS present_frac
        |FROM (
        |  SELECT 'doc_id' AS field, count(*) AS n_docs FROM documents
        |  UNION ALL
        |  SELECT 'quality', count(*) FILTER (WHERE doc_id % 2 = 0) FROM documents
        |  UNION ALL
        |  SELECT 'text', count(*) FROM documents
        |) ORDER BY field""".stripMargin,
    // j11: compaction preserves content exactly — j9's clean subset with
    // the src_shard provenance (== the lang partition) retained in-row.
    "j11_compact_corpus" ->
      """SELECT doc_id, lang, n_chars, concat('lang=', lang) AS src_shard
        |FROM documents
        |WHERE doc_id % 13 <> 0 ORDER BY doc_id""".stripMargin)
}
