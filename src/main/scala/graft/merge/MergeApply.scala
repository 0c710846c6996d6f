package graft.merge

import java.time.format.DateTimeFormatter
import java.time.Instant
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Observation, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Outcome of a merge apply — counts and verdict the reference surfaces via
  * `@@ROWCOUNT` / variance / RAISERROR (sp_SimpleMerge.sql:470-491).
  *
  * @param affectedRows rows inserted+updated+deleted (A21)
  * @param targetRows   (filtered) target rowcount used as the variance
  *                     denominator (A20)
  * @param variancePct  affected/target*100, NaN when target is empty
  * @param committed    whether the staged result replaced the target
  * @param auditPath    where the audit OUTPUT rows were appended, when the
  *                     `audit` option was set (A17 / `@output`)
  */
final case class MergeResult(
    affectedRows: Long,
    targetRows: Long,
    variancePct: Double,
    committed: Boolean,
    auditPath: Option[String] = None)

/** Transactional apply: what the reference gets from BEGIN TRAN / COMMIT /
  * ROLLBACK (sp_SimpleMerge.sql:470-484) we get from a staged parquet write
  * plus an atomic directory swap — all-or-nothing, single-writer assumed,
  * rename-atomic filesystem assumed (HDFS/local; on S3-style object stores
  * front this with a metastore pointer swap). After a committed merge, a
  * `lastUpdate` ISO-8601 timestamp is stamped into a sidecar, the analog of
  * the reference's extended property (sp_SimpleMerge.sql:129-140,485-491).
  *
  * Scale design (the 100 TB constraint): the expensive full-outer join
  * executes exactly ONCE per apply —
  *
  *   - without audit: the merged result streams straight to the staging
  *     directory while an [[Observation]] on the classified frame collects
  *     affected/insert/total counts in the same job; the threshold verdict
  *     is decided after the write, before the swap (the same
  *     execute-then-rollback shape as the reference's BEGIN TRAN /
  *     ROLLBACK);
  *   - with audit: the classified frame (merged columns + before-images +
  *     action) is staged once, and counts, the audit table, and the final
  *     target content are all derived from the staged copy — cheap rescans
  *     of already-joined data, never a join re-run.
  */
object MergeApply {

  val MetaFile = "_simplemerge_meta.json"

  /** Default audit table location, the analog of the reference's
    * `@output` default name `<target>_SimpleMergeOutput`
    * (sp_SimpleMerge.sql:64, README.md:42-44).
    */
  def defaultAuditPath(targetPath: String): String =
    targetPath.stripSuffix("/") + "_SimpleMergeOutput"

  /** Run the merge against a parquet-backed target directory.
    *
    * Threshold semantics (A22/A23): variance = affected/targetCount*100;
    * commit iff no threshold, or target is empty (bypass,
    * sp_SimpleMerge.sql:473-476), or variance <= threshold — otherwise the
    * target is left untouched, staging is cleaned up, and
    * MergeThresholdExceededException is raised with the actual variance.
    * Unlike the reference (which stamps lastUpdate even after a threshold
    * RAISERROR — a documented quirk, SURVEY §3.3), we do NOT stamp on
    * abort, and audit rows are NOT written on abort (the reference's
    * OUTPUT rows roll back with the transaction).
    */
  def applyTo(
      spark: SparkSession,
      targetPath: String,
      source: DataFrame,
      opts: MergeOptions,
      auditPath: Option[String] = None): MergeResult = {
    // Parse/validate the threshold up front (A23) so a malformed string
    // fails before any data movement, like the reference's isnumeric gate
    // (sp_SimpleMerge.sql:92-95).
    val thresholdPct = opts.thresholdPct

    val target = spark.read.parquet(targetPath)
    val plan = MergePlan.build(target.schema, source.schema, opts)
    val frame = new MergeFrame(target, source, plan)

    val tgt = new Path(targetPath)
    val fs = tgt.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val token = UUID.randomUUID().toString.take(8)
    val staging = new Path(tgt.getParent, s".${tgt.getName}.staging-$token")

    if (opts.audit)
      applyWithAudit(spark, frame, thresholdPct, fs, tgt, staging, token,
        auditPath.getOrElse(defaultAuditPath(targetPath)))
    else
      applyDirect(frame, thresholdPct, fs, tgt, staging, token)
  }

  /** Partition-scoped apply against a [[PartitionedTarget]] directory:
    * reads, rewrites, and swaps ONLY the bucket directories the source's
    * keys hash into — apply cost scales with the delta, not the target.
    * See [[PartitionedApply]] for the semantics contract (equivalent to an
    * implicit targetFilter on the touched buckets).
    */
  def applyToPartitioned(
      spark: SparkSession,
      targetPath: String,
      source: DataFrame,
      opts: MergeOptions,
      auditPath: Option[String] = None): MergeResult =
    PartitionedApply.applyTo(spark, targetPath, source, opts, auditPath)

  /** Audit-off path: one job writes the merged result to staging while the
    * Observation collects counts from the classified frame inside it.
    */
  private def applyDirect(
      frame: MergeFrame,
      thresholdPct: Option[Double],
      fs: FileSystem,
      tgt: Path,
      staging: Path,
      token: String): MergeResult = {
    val obs = Observation(s"merge-$token")
    writeOrCleanup(frame.mergedObserved(obs), staging, fs)
    val metrics = obs.get
    val affected = metrics("affected").asInstanceOf[Long]
    val inserted = metrics("inserted").asInstanceOf[Long]
    val targetRows = metrics("total").asInstanceOf[Long] - inserted

    val variance = verdictOrCleanup(affected, targetRows, thresholdPct, fs, staging)
    swap(fs, tgt, staging, token)
    stampLastUpdate(fs, tgt)
    MergeResult(affected, targetRows, variance, committed = true)
  }

  /** Audit-on path (`@output`): stage the classified frame once; counts,
    * audit rows, and the final target content all derive from the staged
    * parquet. Audit rows are appended only after the threshold verdict
    * passes (OUTPUT rolls back with the transaction in the reference).
    */
  private def applyWithAudit(
      spark: SparkSession,
      frame: MergeFrame,
      thresholdPct: Option[Double],
      fs: FileSystem,
      tgt: Path,
      staging: Path,
      token: String,
      auditPath: String): MergeResult = {
    val work = new Path(tgt.getParent, s".${tgt.getName}.work-$token")
    try {
      writeOrCleanup(frame.resolved, work, fs)
      val staged = spark.read.parquet(work.toString)
      val row = staged.agg(
        count(when(col(MergeFrame.ActionCol).isNotNull, 1)).as("affected"),
        count(when(col(MergeFrame.ActionCol) === "INSERT", 1)).as("inserted"),
        count(lit(1)).as("total")).head()
      val affected = row.getLong(0)
      val targetRows = row.getLong(2) - row.getLong(1)

      val variance = verdictOrCleanup(affected, targetRows, thresholdPct, fs, work)
      writeOrCleanup(frame.mergedFrom(staged), staging, fs)
      swap(fs, tgt, staging, token)
      // Audit appends AFTER the swap: the reference's OUTPUT rows exist iff
      // the transaction commits, and an append cannot be rolled back — so a
      // staging/swap failure must never leave phantom audit rows behind.
      // (Residual window: a committed swap whose audit append then fails
      // surfaces as an exception with the target already updated.)
      frame.auditFrom(staged).write.mode(SaveMode.Append).parquet(auditPath)
      stampLastUpdate(fs, tgt)
      MergeResult(affected, targetRows, variance, committed = true, auditPath = Some(auditPath))
    } finally fs.delete(work, true)
  }

  /** Write a frame to a staging dir, deleting the partial output if the
    * write itself fails (no leaked staging dirs).
    */
  private[merge] def writeOrCleanup(df: DataFrame, dir: Path, fs: FileSystem): Unit =
    try df.write.mode(SaveMode.Overwrite).parquet(dir.toString)
    catch { case e: Throwable => fs.delete(dir, true); throw e }

  /** Threshold verdict (A22): returns the variance, or cleans up the given
    * staging/work dir and raises when the threshold is breached.
    */
  private[merge] def verdictOrCleanup(
      affected: Long,
      targetRows: Long,
      thresholdPct: Option[Double],
      fs: FileSystem,
      cleanup: Path): Double = {
    val variance: Double =
      if (targetRows > 0) affected.toDouble / targetRows * 100.0 else Double.NaN
    val within = thresholdPct match {
      case Some(pct) if targetRows > 0 => variance <= pct
      case _ => true // no threshold, or empty-target bypass (sql:473-476)
    }
    if (!within) {
      fs.delete(cleanup, true)
      throw new MergeThresholdExceededException(variance, thresholdPct.get)
    }
    variance
  }

  /** Atomic two-rename swap under a crash-recovery intent marker
    * (VERDICT r2 next #8). If the promote rename fails, the retire is
    * rolled back; on any failure the staging dir is cleaned up. A process
    * CRASH between the two renames previously left the target missing
    * under its retired name with nothing recording why — the marker makes
    * that state detectable and [[recover]] restores it (single-writer,
    * rename-atomic filesystem assumed — documented above).
    */
  private def swap(fs: FileSystem, tgt: Path, staging: Path, token: String): Unit = {
    val retired = new Path(tgt.getParent, s".${tgt.getName}.retired-$token")
    writeSwapMarker(fs, tgt, token, staging, retired, buckets = Nil)
    if (!fs.rename(tgt, retired)) {
      fs.delete(staging, true)
      removeSwapMarker(fs, tgt, token)
      throw new IllegalStateException(s"Atomic swap failed: could not retire $tgt")
    }
    if (!fs.rename(staging, tgt)) {
      fs.rename(retired, tgt) // roll back
      fs.delete(staging, true)
      removeSwapMarker(fs, tgt, token)
      throw new IllegalStateException(s"Atomic swap failed: could not promote $staging")
    }
    fs.delete(retired, true)
    removeSwapMarker(fs, tgt, token)
  }

  private def markerPath(tgt: Path, token: String): Path =
    new Path(tgt.getParent, s".${tgt.getName}.swap-$token.json")

  /** Persist the swap intent BEFORE the first rename: which staging dir is
    * being promoted, where the previous content retires to, and (for a
    * partitioned apply) which bucket directories participate. Removed as
    * the final step of a successful swap — so a marker on disk always means
    * "a swap was interrupted" and carries everything [[recover]] needs.
    */
  private[merge] def writeSwapMarker(
      fs: FileSystem,
      tgt: Path,
      token: String,
      staging: Path,
      retired: Path,
      buckets: Seq[Int]): Unit = {
    val json =
      s"""{"staging": "$staging", "retired": "$retired", "buckets": [${buckets.mkString(", ")}]}"""
    val out = fs.create(markerPath(tgt, token), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  private[merge] def removeSwapMarker(fs: FileSystem, tgt: Path, token: String): Unit =
    fs.delete(markerPath(tgt, token), false)

  /** Recover a target whose swap was interrupted (process crash between
    * renames): scans for leftover intent markers and restores a consistent
    * state, returning true when anything was repaired.
    *
    * Policy — the commit point of a whole-directory swap is the promote
    * rename, so: target present with staging consumed → the swap committed,
    * roll FORWARD (drop retired leftovers); target missing → roll BACK
    * (restore the retired content, drop staging). A partitioned swap has
    * no single atomic commit point (it renames one bucket at a time), so an
    * interrupted one always rolls BACK from the per-bucket retired dirs —
    * the transactional contract: an interrupted merge never happened.
    */
  def recover(spark: SparkSession, targetPath: String): Boolean = {
    val tgt = new Path(targetPath)
    val fs = tgt.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parent = tgt.getParent
    if (parent == null || !fs.exists(parent)) return false
    val prefix = s".${tgt.getName}.swap-"
    val markers = fs.listStatus(parent).map(_.getPath)
      .filter(p => p.getName.startsWith(prefix) && p.getName.endsWith(".json"))
    markers.foreach { m =>
      val in = fs.open(m)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      def field(k: String): String =
        ("\"" + k + "\"\\s*:\\s*\"([^\"]+)\"").r.findFirstMatchIn(txt).map(_.group(1))
          .getOrElse(throw new IllegalStateException(s"Malformed swap marker $m"))
      val staging = new Path(field("staging"))
      val retired = new Path(field("retired"))
      val buckets = "\"buckets\"\\s*:\\s*\\[([^\\]]*)\\]".r.findFirstMatchIn(txt)
        .map(_.group(1).split(',').map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq)
        .getOrElse(throw new IllegalStateException(s"Malformed swap marker $m"))

      if (buckets.isEmpty) {
        val promoted = fs.exists(tgt) && !fs.exists(staging)
        if (!promoted) {
          if (!fs.exists(tgt) && fs.exists(retired)) fs.rename(retired, tgt)
          fs.delete(staging, true)
        }
        fs.delete(retired, true)
      } else {
        buckets.foreach { b =>
          val name = s"${PartitionedTarget.BucketCol}=$b"
          val cur = new Path(tgt, name)
          val ret = new Path(retired, name)
          val stg = new Path(staging, name)
          if (fs.exists(ret)) { // bucket existed pre-merge: restore it
            fs.delete(cur, true)
            fs.rename(ret, cur)
          } else if (!fs.exists(stg)) { // new bucket already promoted: undo
            fs.delete(cur, true)
          }
        }
        fs.delete(staging, true)
        fs.delete(retired, true)
      }
      fs.delete(m, false)
    }
    markers.nonEmpty
  }

  /** Write the lastUpdate sidecar (datetime2(3)-style millisecond precision,
    * sp_SimpleMerge.sql:488).
    */
  private[merge] def stampLastUpdate(fs: FileSystem, tgt: Path): Unit = {
    val ts = DateTimeFormatter.ISO_INSTANT
      .format(Instant.now().truncatedTo(java.time.temporal.ChronoUnit.MILLIS))
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
