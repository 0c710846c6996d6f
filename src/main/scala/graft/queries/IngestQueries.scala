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
  private def jsonlSchema: StructType = new StructType()
    .add("doc_id", LongType).add("lang", StringType)
    .add("n_chars", LongType).add("text", StringType)

  /** Serialize documents to JSONL, corrupt every 13th line (prefix
    * damage — invalid JSON regardless of payload), write as text files,
    * return the shard path. Untimed setup for the bench phases.
    */
  private[graft] def jsonlFixture(s: SparkSession, dir: String): String = {
    val path = Fixtures.scratchDir("graft-jsonl") + "/shard"
    table(s, dir, "documents")
      .select(col("doc_id"),
        to_json(struct(col("doc_id"), col("lang"), col("n_chars"), col("text")))
          .as("value"))
      .select(Ingest.corruptWhen(col("doc_id") % 13 === 0, col("value")).as("value"))
      .write.mode("overwrite").text(path)
    path
  }

  /** Two JSONL shards with drifted schemas: odd docs predate the
    * `quality` field, even docs carry it — additive schema evolution,
    * the routine kind. Both land under one root; the wide-schema read
    * must surface old rows with NULL quality, not quarantine them.
    */
  private[graft] def driftFixture(s: SparkSession, dir: String): String = {
    val root = Fixtures.scratchDir("graft-jsonl-drift")
    val docs = table(s, dir, "documents")
    docs.filter(col("doc_id") % 2 === 1)
      .select(to_json(struct(col("doc_id"), col("text"))).as("value"))
      .write.mode("overwrite").text(s"$root/old")
    docs.filter(col("doc_id") % 2 === 0)
      .select(to_json(struct(col("doc_id"), col("text"),
        round(col("n_chars") / 1000.0, 6).as("quality"))).as("value"))
      .write.mode("overwrite").text(s"$root/new")
    root
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

  private def csvSchema: StructType = new StructType()
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
    // (asserted by spec; the oracle checks the counts).
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
        |            THEN round(round(n_chars / CAST(1000 AS DOUBLE), 6), 6) END AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,
    "j4_csv_quarantine" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id % 11 <> 0 ORDER BY doc_id""".stripMargin)
}
