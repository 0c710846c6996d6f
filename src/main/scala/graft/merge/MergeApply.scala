package graft.merge

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Outcome of a merge apply — counts and verdict the reference surfaces via
  * `@@ROWCOUNT` / variance / RAISERROR (sp_SimpleMerge.sql:470-491).
  *
  * @param affectedRows rows inserted+updated+deleted (A21)
  * @param targetRows   (filtered) target rowcount used as the variance
  *                     denominator (A20); -1 when not computed (lazy, :144)
  * @param variancePct  affected/target*100, NaN when not computed
  * @param committed    whether the staged result replaced the target
  */
final case class MergeResult(
    affectedRows: Long,
    targetRows: Long,
    variancePct: Double,
    committed: Boolean)

/** Transactional apply: what the reference gets from BEGIN TRAN / COMMIT /
  * ROLLBACK (sp_SimpleMerge.sql:470-484) we get from a staged parquet write
  * plus an atomic directory swap — all-or-nothing, single-writer assumed
  * (SURVEY §7.4). After a committed merge, a `lastUpdate` ISO-8601 timestamp
  * is stamped into a sidecar, the analog of the reference's extended
  * property (sp_SimpleMerge.sql:129-140,485-491).
  */
object MergeApply {

  val MetaFile = "_simplemerge_meta.json"

  /** Run the merge against a parquet-backed target directory.
    *
    * Threshold semantics (A22/A23): variance = affected/targetCount*100;
    * commit iff no threshold, or target is empty (bypass,
    * sp_SimpleMerge.sql:473-476), or variance <= threshold — otherwise the
    * target is left untouched and MergeThresholdExceededException is raised
    * with the actual variance. Unlike the reference (which stamps lastUpdate
    * even after a threshold RAISERROR — a documented quirk, SURVEY §3.3), we
    * do NOT stamp on abort.
    */
  def applyTo(spark: SparkSession, targetPath: String, source: DataFrame, opts: MergeOptions): MergeResult = {
    val target = spark.read.parquet(targetPath)
    val plan = MergePlan.build(target.schema, source.schema, opts)
    val frame = new MergeFrame(target, source, plan)

    // Lazy rowcount: only when a threshold demands it (sp_SimpleMerge.sql:144-150).
    val thresholdPct = opts.thresholdPct
    val targetRows: Long =
      if (thresholdPct.isDefined) frame.filteredTarget.count() else -1L
    val affected = frame.affectedCount()
    val variance: Double =
      if (targetRows > 0) affected.toDouble / targetRows * 100.0 else Double.NaN

    val withinThreshold = thresholdPct match {
      case Some(pct) if targetRows > 0 => variance <= pct
      case _ => true // no threshold, or empty-target bypass
    }
    if (!withinThreshold)
      throw new MergeThresholdExceededException(variance, thresholdPct.get)

    // Staged write + atomic swap.
    val conf = spark.sparkContext.hadoopConfiguration
    val tgt = new Path(targetPath)
    val fs = tgt.getFileSystem(conf)
    val token = UUID.randomUUID().toString.take(8)
    val staging = new Path(tgt.getParent, s".${tgt.getName}.staging-$token")
    val retired = new Path(tgt.getParent, s".${tgt.getName}.retired-$token")
    frame.merged.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    if (!fs.rename(tgt, retired))
      throw new IllegalStateException(s"Atomic swap failed: could not retire $tgt")
    if (!fs.rename(staging, tgt)) {
      fs.rename(retired, tgt) // roll back
      throw new IllegalStateException(s"Atomic swap failed: could not promote $staging")
    }
    fs.delete(retired, true)
    stampLastUpdate(fs, tgt)
    MergeResult(affected, targetRows, variance, committed = true)
  }

  /** Write the lastUpdate sidecar (datetime2(3)-style millisecond precision,
    * sp_SimpleMerge.sql:488).
    */
  private def stampLastUpdate(fs: FileSystem, tgt: Path): Unit = {
    val ts = DateTimeFormatter.ISO_INSTANT
      .format(Instant.now().atZone(ZoneOffset.UTC).toInstant.truncatedTo(java.time.temporal.ChronoUnit.MILLIS))
    val out = fs.create(new Path(tgt, MetaFile), true)
    try out.write(s"""{"lastUpdate": "$ts"}""".getBytes("UTF-8"))
    finally out.close()
  }

  /** Read back the lastUpdate stamp, if any. */
  def lastUpdate(spark: SparkSession, targetPath: String): Option[String] = {
    val tgt = new Path(targetPath, MetaFile)
    val fs = tgt.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(tgt)) None
    else {
      val in = fs.open(tgt)
      try {
        val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString
        "\"lastUpdate\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(txt).map(_.group(1))
      } finally in.close()
    }
  }
}
