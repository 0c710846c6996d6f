package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.GraftSuite
import graft.queries.Fixtures

/** Routing contract of the streaming ingest gate: every line lands in
  * exactly one verdict partition, clean rows carry typed columns (and
  * no raw bytes), quarantine rows carry the raw line verbatim (and no
  * typed values) — converging to the batch reader's split.
  */
class StreamingIngestSpec extends GraftSuite {

  private def schema = new StructType()
    .add("doc_id", LongType).add("lang", StringType).add("n_chars", LongType)

  private val good = Seq(
    """{"doc_id":1,"lang":"en","n_chars":10}""",
    """{"doc_id":2,"lang":"fr","n_chars":20}""")
  private val torn = Seq("torn-line-a", """{"doc_id":3,"lang":""")

  test("gate: typed columns on clean rows, raw bytes on quarantine rows, total routing") {
    val df = spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](
        (good ++ torn).map(org.apache.spark.sql.Row(_)): _*),
      new StructType().add("value", StringType))
    val gated = StreamingIngest.gate(df, "value", schema)
    assert(gated.columns.toSeq === Seq("doc_id", "lang", "n_chars", "raw_line", "routed"))
    val clean = gated.filter(col("routed") === "clean").orderBy("doc_id").collect()
    assert(clean.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(clean.forall(_.isNullAt(3))) // no raw bytes on the corpus side
    val q = gated.filter(col("routed") === "quarantine").collect()
    assert(q.map(_.getString(3)).toSet === torn.toSet) // verbatim
    assert(q.forall(r => r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2)))
    assert(clean.length + q.length === good.length + torn.length) // totality
  }

  test("ingestTo: file-source shards converge to the batch split in a verdict-partitioned sink") {
    val dir = Fixtures.scratchDir("graft-st-ingest-spec")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir, "in"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "in/s0.jsonl"),
      (good.take(1) ++ torn.take(1)).mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "in/s1.jsonl"),
      (good.drop(1) ++ torn.drop(1)).mkString("\n").getBytes("UTF-8"))
    val stream = spark.readStream.option("maxFilesPerTrigger", 1).text(s"$dir/in")
    val q = StreamingIngest.ingestTo(stream, "value", schema, s"$dir/out", s"$dir/cp")
    try q.processAllAvailable() finally q.stop()
    val back = spark.read.parquet(s"$dir/out")
    // Partition pruning by verdict: consumers read routed=clean only.
    assert(back.filter(col("routed") === "clean")
      .select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    assert(back.filter(col("routed") === "quarantine")
      .select("raw_line").collect().map(_.getString(0)).toSet === torn.toSet)
    assert(back.count() === 4)
  }
}
