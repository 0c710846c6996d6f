package graft.tools

import org.apache.spark.sql.SparkSession

import graft.pipeline.{Dedup, HashMode}

/** Isolated A/B for the repeated-span gram sweep (VERDICT r12 next #5):
  * the d27/d28 bench queries run at n=8, where the per-position string
  * build is small and both forms tie — the allocation difference the
  * rolling hash exists to remove scales with the gram WIDTH (the string
  * form materializes n tokens per position), so this times the sweep at
  * the production width (n=50, Lee et al.'s exact-substring setting)
  * over the real documents table. One variant per JVM (the
  * bench_isolated discipline); median over in-JVM iterations after one
  * warmup.
  *
  * Run: `java -cp ... graft.tools.GramSweepAb string|rolling [sfDir] [n] [iters]`
  * → one JSON line `{"variant":…,"n":…,"median_sec":…,"samples":[…]}`.
  */
object GramSweepAb {
  def main(args: Array[String]): Unit = {
    val variant = args.headOption.getOrElse("rolling")
    require(Seq("string", "rolling").contains(variant), s"unknown variant $variant")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val n = args.lift(2).map(_.toInt).getOrElse(50)
    val iters = args.lift(3).map(_.toInt).getOrElse(7)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-gram-ab")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def run(): Long = (variant match {
      case "string" => Dedup.repeatedSpans(docs, "doc_id", "text", n, HashMode.Xxhash64)
      case "rolling" => Dedup.repeatedSpansRolling(docs, "doc_id", "text", n)
    }).count()

    run() // warmup: JIT + file listing
    val samples = (1 to iters).map { _ =>
      val t0 = System.nanoTime()
      run()
      (System.nanoTime() - t0) / 1e9
    }
    val med = samples.sorted.apply(samples.length / 2)
    println(s"""{"variant":"$variant","n":$n,"sf_dir":"$sfDir","median_sec":${f"$med%.3f"},"samples":[${samples.map(s => f"$s%.3f").mkString(",")}]}""")
    spark.stop()
  }
}
