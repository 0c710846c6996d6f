package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.merge.SimpleMerge

/** AQE-skew vs badKeySalt decision experiment (VERDICT r10 next #7):
  * q27/q28 diagnose hot keys, A5's salted rank fixes them at a measured
  * 1.4–2.6× premium on uniform data, and Spark's AQE skew-join handles
  * some of the same cases for free — this probe measures WHICH mechanism
  * helps WHERE, on a planted-skew merge.
  *
  * Fixture: `n` source rows and `n` target rows under `badKey` dedup
  * (duplicate keys allowed). A fraction `hotFrac` of all rows share ONE
  * key (the hot vendor); the rest are unique. The merge's two skew-prone
  * stages are (1) the rank WINDOW (row_number over the key) and (2) the
  * full-outer JOIN on (key, rn). AQE's skew handling splits oversized
  * JOIN partitions at runtime but cannot split a WINDOW partition — a
  * window's partition must be colocated to rank — so the hypothesis is:
  * AQE alone leaves the hot window partition on one core, while the
  * salted two-phase rank spreads it.
  *
  * Variants, each timed as merged.count() in this JVM (median of
  * `iters`, first warmup discarded; same-JVM interleaving makes the
  * RATIOS trustworthy even where absolute numbers carry host tax):
  *   - plain+aqe:   badKey window rank, AQE on (the default config)
  *   - plain-aqe:   badKey window rank, AQE off
  *   - salt8+aqe:   badKeySalt(8), AQE on
  *
  * Run: `sbt "runMain graft.tools.SkewProbe [n] [hotFrac] [iters]"`.
  */
object SkewProbe {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val hotFrac = args.lift(1).map(_.toDouble).getOrElse(0.3)
    val iters = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-skew-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val hot = (n * hotFrac).toLong
    // Planted skew: `hot` rows share key 0; the rest carry unique keys.
    // Payload perturbation makes a third of matches real updates.
    def side(shift: Long): DataFrame = spark.range(n)
      .select(
        when(col("id") < hot, lit(0L)).otherwise(col("id")).as("k"),
        (col("id") * 37 + shift).cast("double").as("amt"),
        concat(lit("row"), col("id") + shift).as("tag"))

    val tgt = side(0L)
    val src = side(1L)

    def merge(salt: Int) = {
      val m = SimpleMerge.into(tgt, "t").using(src, "s").keys("k").delete("YES")
      (if (salt > 1) m.badKeySalt(salt) else m.badKey(true)).merged
    }

    def timed(label: String, aqe: Boolean, salt: Int): Double = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      val times = (0 to iters).map { _ =>
        val t0 = System.nanoTime()
        merge(salt).count()
        (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted // drop warmup
      val med = times(times.length / 2)
      println(f"[skew] $label%-10s median=$med%.2fs samples=${times.map(t => f"$t%.2f").mkString(",")}")
      med
    }

    println(s"[skew] n=$n hotFrac=$hotFrac (hot key holds $hot rows) cpus=$cpus iters=$iters")
    val plainAqe = timed("plain+aqe", aqe = true, salt = 0)
    val plainNoAqe = timed("plain-aqe", aqe = false, salt = 0)
    val saltAqe = timed("salt8+aqe", aqe = true, salt = 8)
    println(f"""{"metric":"skew_probe","n":$n,"hot_frac":$hotFrac,"plain_aqe":$plainAqe%.3f,"plain_noaqe":$plainNoAqe%.3f,"salt8_aqe":$saltAqe%.3f}""")
    spark.stop()
  }
}
