package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.pipeline._
import graft.queries.{Fixtures, IngestQueries, PipelineQueries}
import graft.sources.Ingest

/** End-to-end crawl-to-corpus demo (the p11 composition): the single
  * pipeline a 100 TB crawl run actually executes, every tier composed —
  *
  *   WARC shards (HTML chrome + planted mirror records)
  *     → quarantine ingest → markup strip → exact dedup
  *     → TRAINED langid routing (predicted language is the partition
  *       key — no metadata survives a crawl)
  *     → CCNet perplexity gate (classifier-bootstrapped reference,
  *       modified-KN trigram, per-lang terciles, tail dropped)
  *     → driver-local BPE → reserved-band piece ids → EOS per doc
  *     → per-lang packed training sequences,
  *
  * with per-stage row counts printed as evidence and the final
  * reconciliation (every surviving doc in exactly one pack; id mass in
  * == id mass out). Stage boundaries materialize (`localCheckpoint`) —
  * the demo-scale analog of the intermediate parquet a production run
  * writes at exactly these seams. Run:
  *   sbt "runMain graft.tools.CrawlDemo [sfDir]"
  */
object CrawlDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-crawl-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def p(msg: String): Unit = println(s"[demo] $msg")

    // Stage 0 — crawl shards through the quarantine reader.
    val shard = IngestQueries.warcCrawlFixture(spark, sfDir)
    val (clean, quarantine) = Ingest.warc(spark, shard)
    val ingested = clean.select(
        regexp_extract(col("uri"), "/doc/([0-9]+)$", 1).cast("long").as("doc_id"),
        col("body"))
      .localCheckpoint(true)
    p(s"ingest: ${ingested.count()} clean records, ${quarantine.count()} quarantined")

    // Stage 1 — strip the crawl chrome.
    val scrubbed = ingested.select(col("doc_id"),
      TextOps.tagCount(col("body")).as("n_tags"),
      TextOps.stripMarkup(col("body")).as("text"))
    val tagStats = scrubbed.agg(sum("n_tags"), sum(TextOps.tagCount(col("text")))).head()
    p(s"scrub: ${tagStats.getLong(0)} tags stripped; residual tags: ${tagStats.getLong(1)} (expect 0)")

    // Stage 2 — exact dedup on the normalized fingerprint.
    val deduped = scrubbed.select("doc_id", "text")
      .withColumn("__fp", TextOps.fingerprint(col("text")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__fp")).orderBy(col("doc_id"))))
      .filter(col("__rn") === 1).drop("__fp", "__rn")
      .localCheckpoint(true)
    p(s"dedup: ${deduped.count()} docs (mirror records collapsed)")

    // Stage 3 — trained langid routes by PREDICTED language.
    val lfeats = (0 until PipelineQueries.LangidBuckets).map(b => s"x$b")
    val seed = PipelineQueries.LangidSeeds.toDF("doc_id", "lang", "text")
    val wl = Classifier.trainSoftmax(
      PipelineQueries.langidFeatures(seed).cache(), lfeats, "y",
      numClasses = PipelineQueries.LangidLangs.size, iters = 8, lr = 1.0)
    val routed = Classifier.scoreSoftmax(
        PipelineQueries.langidFeatures(
          deduped.withColumn("lang", lit(null).cast("string"))), wl, lfeats)
      .withColumn("pred_lang", element_at(
        array(PipelineQueries.LangidLangs.map(lit): _*),
        (col("pred_class") + 1).cast("int")))
      .select("doc_id", "pred_lang")
    val docs = deduped.join(routed, Seq("doc_id")).localCheckpoint(true)
    val routeCensus = docs.groupBy("pred_lang").count().orderBy("pred_lang")
      .collect().map(r => s"${r.getString(0)}:${r.getLong(1)}").mkString(" ")
    p(s"langid routing: $routeCensus")

    // Stage 4 — CCNet perplexity gate per predicted language.
    val cf = PipelineQueries.classifierFeatures(
      docs.withColumn("n_chars", length(col("text")).cast("long")))
    val wq = Classifier.trainLogistic(cf, Seq("x1", "x2", "x3"), "y",
      iters = 3, lr = 1.0)
    val ref = docs.join(
      Classifier.score(cf, wq, Seq("x1", "x2", "x3"), threshold = 0.5)
        .filter(col("accepted")).select("doc_id"), Seq("doc_id"))
    p(s"gate reference slice: ${ref.count()} docs")
    val lm = TextStats.trigramCounts(ref, "text")
    val kept = TextStats.mknTrigramNllAgainst(docs, lm, "doc_id", "text")
      .join(docs.select("doc_id", "pred_lang"), Seq("doc_id"))
      .withColumn("bucket", ntile(3).over(
        Window.partitionBy("pred_lang").orderBy(col("avg_nll"), col("doc_id"))))
      .filter(col("bucket") <= 2).select("doc_id")
    val corpus = docs.join(kept, Seq("doc_id")).localCheckpoint(true)
    p(s"perplexity gate: ${corpus.count()} docs kept (tail tercile dropped)")

    // Stage 5 — tokenize (driver-local BPE, reserved band) + pack.
    val model = Bpe.trainLocal(corpus, "text", numMerges = 8)
    val store = Fixtures.scratchDir("graft-crawl-demo") + "/bpe"
    ModelStore.saveBpe(model, store)
    val served = ModelStore.loadBpe(spark, store)
    p(s"tokenizer: ${served.merges.size} merges trained, persisted, reloaded " +
      s"(separator '${served.wordSeparator}')")
    val vocabSize = Bpe.pieceVocab(served, SpecialTokens.Band).count()
    val ids = Packing.withEosForDocs(
      Bpe.encodeIds(corpus, "doc_id", "text", served, reserved = SpecialTokens.Band),
      corpus, "doc_id", SpecialTokens.EosId, vocabSize, SpecialTokens.BandSize)
      .localCheckpoint(true)
    val counts = ids.groupBy("doc_id").agg(count(lit(1)).as("n_pieces"))
      .join(corpus.select("doc_id", "pred_lang"), Seq("doc_id"))
    val packs = Packing.packGreedyByCount(counts, "doc_id", "n_pieces",
      budget = 512, groupCols = Seq("pred_lang"))
    val seqs = Packing.packedSequences(ids, packs, "doc_id", Seq("pred_lang"))
      .localCheckpoint(true)
    val nPacks = seqs.select("pred_lang", "pack_id").distinct().count()
    val packedDocs = seqs.select("doc_id").distinct().count()
    p(s"packing: $nPacks packs; docs packed: $packedDocs " +
      s"(expect ${corpus.count()} — every doc, EOS included, in exactly one pack)")
    val massIn = ids.agg(sum("piece_id")).head().getLong(0)
    val massOut = seqs.agg(sum("piece_id")).head().getLong(0)
    p(s"id-mass reconciliation: in=$massIn out=$massOut (expect equal)")
    val eosPerDoc = seqs.filter(col("piece_id") === SpecialTokens.EosId)
      .groupBy("doc_id").count().filter(col("count") =!= 1).count()
    p(s"EOS invariant: docs without exactly one marker: $eosPerDoc (expect 0)")

    spark.stop()
  }
}
