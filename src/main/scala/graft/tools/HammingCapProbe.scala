package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Capacity-planning readout for the hamming-ball SimHash pairing
  * (ADVICE r9: at growing corpus sizes, (band, segment) buckets approach
  * `bucketCap` and silently drop true pairs — the operator needs the
  * cap's shadow quantified per scale, not just exposed as a lazy frame).
  * Prints, for the d13 fixture at a given SF dir: total banded buckets,
  * dropped buckets with their occupancy spectrum, max surviving
  * occupancy (headroom to the cap), and the pair count — the numbers
  * that tell an operator whether to widen `bits` before raising the cap.
  * Run:
  *   sbt "runMain graft.tools.HammingCapProbe [sfDir] [maxHamming] [cap] [bits]"
  */
object HammingCapProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxHamming = args.lift(1).map(_.toInt).getOrElse(3)
    val cap = args.lift(2).map(_.toInt).getOrElse(200)
    val bits = args.lift(3).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-hamming-cap-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // The d13 fixture: documents plus a near-copy slice (every 25th doc
    // with sentinel tokens appended), same as PipelineQueries.docsNearAug.
    val d = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val docs = d.unionByName(
      d.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          concat(col("text"), lit(" zq zq zq")).as("text")))

    val fps = Dedup.simhash(docs, "doc_id", "text", bits = bits)
    val diag = Dedup.hammingPairsDiag(fps, "id", "simhash", maxHamming, bits = bits, bucketCap = cap)
    val nDocs = docs.count()
    val dropped = diag.droppedBuckets
      .agg(count(lit(1)).as("n"), max(col("occupancy")).as("maxOcc"),
        min(col("occupancy")).as("minOcc"))
      .collect().head
    val nPairs = diag.pairs.count()
    println(s"[hamming] corpus=$nDocs docs, maxHamming=$maxHamming, bucketCap=$cap, " +
      s"bands=${maxHamming + 1} x ~${bits / (maxHamming + 1)}-bit segments of a $bits-bit fingerprint")
    println(s"[hamming] dropped buckets: n=${dropped.getLong(0)}" +
      (if (dropped.getLong(0) > 0)
        s" occupancy=[${dropped.get(2)}, ${dropped.get(1)}]" else "") +
      s"; pairs surviving the cap: $nPairs")
    println("[hamming] guidance: dropped buckets near the cap mean the fingerprint is too " +
      "narrow for the corpus — widen bits (hammingPairs is width-agnostic) before raising the cap")
    spark.stop()
  }
}
