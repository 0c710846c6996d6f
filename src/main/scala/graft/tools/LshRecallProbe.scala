package graft.tools

import org.apache.spark.sql.SparkSession

import graft.pipeline.Dedup

/** Prints the measured MinHash/LSH recall curve vs the exact
  * inverted-index Jaccard baseline over the near-dup-augmented documents
  * corpus — the band-count knob an LSH operator actually tunes with
  * (the text-tier sibling of [[RecallProbe]]'s IVF curve). Precision is
  * exact by construction (candidates verify against true Jaccard), so
  * recall is the only loss. Run:
  *   sbt "runMain graft.tools.LshRecallProbe [sfDir]"
  */
object LshRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-lsh-recall-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import org.apache.spark.sql.functions._
    val d = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val corpus = d.unionByName(
      d.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          concat(col("text"), lit(" zq zq zq")).as("text")))
    println(s"[lsh-recall] corpus=${corpus.count()} docs (near-dup augmented), n=3, threshold=0.6")
    Seq((4, 4), (8, 2), (8, 4), (16, 2)).foreach { case (bands, rpb) =>
      val row = Dedup.lshRecall(corpus, "doc_id", "text",
          n = 3, bands = bands, rowsPerBand = rpb, threshold = 0.6)
        .collect().head
      println(f"[lsh-recall] bands=$bands%2d rowsPerBand=$rpb  " +
        f"recall=${row.getDouble(3)}%.4f  (true pairs=${row.getLong(0)})")
    }
    spark.stop()
  }
}
