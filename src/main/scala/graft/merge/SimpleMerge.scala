package graft.merge

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** User-facing facade — the Spark-native equivalent of
  * `exec sp_SimpleMerge @source, @target, @joinColumns, ...`
  * (/root/reference/README.md:104-108):
  *
  * {{{
  * val m = SimpleMerge.into(targetDf, "vendor_tgt")
  *   .using(sourceDf, "vendor_src")
  *   .keys("Vendor")
  *   .delete("YES")            // or "set isDeleted = 1", or anything else = keep
  *   .targetFilter("[Date] >= '2017-12-01'")
  *   .badKey(true)
  *   .threshold("15%")
  * m.merged            // the post-merge target content (lazy DataFrame)
  * m.audit             // the OUTPUT audit frame
  * m.describe(spark)   // @debug=1 grid: rendered MERGE SQL + audit DDL
  * m.applyToPath(spark, "/data/vendor")   // threshold-guarded atomic apply
  * }}}
  */
final class SimpleMerge private (
    target: DataFrame,
    source: DataFrame,
    targetName: String,
    sourceName: String,
    opts: MergeOptions) {

  private def copy(o: MergeOptions) = new SimpleMerge(target, source, targetName, sourceName, o)

  def keys(ks: String*): SimpleMerge = copy(opts.copy(keys = ks))

  /** Comma-separated form, exactly the reference's `@joinColumns` (split is
    * the Spark-side stand-in for the tally-table splitter at
    * sp_SimpleMerge.sql:162-172).
    */
  def joinColumns(csv: String): SimpleMerge =
    copy(opts.copy(keys = csv.split(',').map(_.trim).filter(_.nonEmpty).toSeq))

  /** `@delete` string; `[bracket]` identifiers in soft-delete SET
    * expressions normalize to backticks, same as targetFilter.
    */
  def delete(mode: String): SimpleMerge =
    copy(opts.copy(delete = DeleteMode.parse(normalizeBrackets(mode))))
  def deleteMode(mode: DeleteMode): SimpleMerge = copy(opts.copy(delete = mode))
  def targetFilter(predicate: String): SimpleMerge =
    copy(opts.copy(targetFilter = Some(normalizeBrackets(predicate))))
  def badKey(b: Boolean): SimpleMerge = copy(opts.copy(badKey = b))

  /** Skew-safe badKey: spread each key's dedup rank over `n` salt buckets
    * (two-phase row_number) so a hot duplicate key cannot pin one reducer.
    * Result is multiset-identical — row order within a key is arbitrary
    * under the reference's %%physloc%% contract either way.
    */
  def badKeySalt(n: Int): SimpleMerge = copy(opts.copy(badKey = true, badKeySalt = n))
  def threshold(t: String): SimpleMerge = copy(opts.copy(threshold = Some(t)))

  /** Request per-row audit OUTPUT persistence on apply (`@output`,
    * sp_SimpleMerge.sql:350-410): `applyToPath` appends the audit frame to
    * the audit table location after a successful swap (appends cannot roll
    * back, so audit rows exist only for committed merges).
    */
  def audit(b: Boolean): SimpleMerge = copy(opts.copy(audit = b))

  /** T-SQL `[bracket]` identifiers → Spark backticks, so reference-style
    * filter strings work verbatim.
    */
  private def normalizeBrackets(e: String): String =
    e.replaceAll("\\[([^\\]]+)\\]", "`$1`")

  lazy val plan: MergePlan = MergePlan.build(target.schema, source.schema, opts)
  private lazy val frame = new MergeFrame(target, source, plan)

  /** Post-merge target content (lazy; nothing executes until an action). */
  def merged: DataFrame = frame.merged

  /** Audit OUTPUT frame (A17). */
  def audit: DataFrame = frame.audit

  /** Rows affected = inserted + updated + deleted (A21). */
  def affectedCount(): Long = frame.affectedCount()

  /** Opt-in duplicate-key check for badKey=false — the reference MERGE
    * fails at runtime on duplicate-key fanout ("cannot UPDATE the same row
    * twice"); the full-outer join would silently multiply rows instead.
    * Call before `merged`/`applyToPath` to restore the fail-fast behavior.
    */
  def assertUniqueKeys(): SimpleMerge = { frame.assertUniqueKeys(); this }

  /** `@debug = 1`: the debug grid as a DataFrame — rendered statement,
    * threshold, target rowcount, audit DDL (sp_SimpleMerge.sql:421-465).
    *
    * @param countRows the reference's debug mode eagerly counts the
    *                  filtered target (sp_SimpleMerge.sql:144) — matched by
    *                  default, but a dry-run against a 100 TB target
    *                  shouldn't cost a full scan: pass false to skip the
    *                  count (the row reads "skipped") and trigger NO job
    *                  (VERDICT r2 next #7).
    */
  def describe(spark: SparkSession, countRows: Boolean = true): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rowcount = if (countRows) frame.filteredTarget.count().toString else "skipped"
    val rows = Seq(
      Row("sql", MergeDebug.renderSql(plan, targetName, sourceName)),
      Row("threshold", opts.threshold.getOrElse("")),
      Row("target rowcount", rowcount),
      Row("output table DDL", MergeDebug.auditDdl(plan, targetName + "_SimpleMergeOutput")))
    spark.createDataFrame(
      rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("debug", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("sql", org.apache.spark.sql.types.StringType))))
  }

  /** Threshold-guarded atomic apply against a parquet directory. When the
    * `audit` option is set, audit rows are appended to `auditPath`
    * (default: `<path>_SimpleMergeOutput`, the reference's `@output`
    * default name).
    */
  def applyToPath(spark: SparkSession, path: String, auditPath: Option[String] = None): MergeResult =
    MergeApply.applyTo(spark, path, source, opts, auditPath)

  /** [[applyToPath]] with the [[SimpleMerge.evolveTarget]] pre-pass
    * applied to the ON-DISK target content before planning — the
    * `WITH SCHEMA EVOLUTION` route of [[MergeSql.applyToTarget]]; the
    * rewritten target carries the evolved columns.
    */
  private[merge] def applyToPathEvolved(
      spark: SparkSession, path: String, auditPath: Option[String] = None): MergeResult =
    MergeApply.applyTo(spark, path, source, opts, auditPath, evolveSchema = true)

  /** Partition-scoped apply against a [[PartitionedTarget]] directory:
    * only the bucket directories the source keys hash into are read,
    * rewritten, and swapped — the incremental path for large targets with
    * small deltas (see [[PartitionedApply]] for the semantics contract).
    */
  def applyToPartitionedPath(spark: SparkSession, path: String, auditPath: Option[String] = None): MergeResult =
    MergeApply.applyToPartitioned(spark, path, source, opts, auditPath)
}

object SimpleMerge {
  def into(target: DataFrame, targetName: String = "target"): Builder =
    new Builder(target, targetName)

  /** Schema-evolution pre-pass (the lakehouse `mergeSchema` idiom,
    * deliberately OPT-IN): align the TARGET to the source by appending
    * every source-only column as a typed NULL, so the standard
    * alignment validation (source ⊆ target — the reference's B6 gate)
    * passes and history rows carry NULL for the new columns. Without
    * this pre-pass a widened source is REJECTED, never silently
    * reinterpreted — evolution must be an explicit decision because it
    * rewrites the target's contract. Change detection then sees the
    * evolved NULL column differ from the source value, so matched rows
    * pick up the new column on the same merge that introduces it.
    * Pure projection — map-only, no shuffle.
    */
  def evolveTarget(target: DataFrame, source: DataFrame): DataFrame = {
    // Column identity honors the session's resolution mode (ADVICE r12
    // #2): under the default case-INsensitive analysis, a source column
    // differing only in case is the SAME column — appending it would
    // plant an ambiguous near-duplicate that breaks the merge downstream.
    val caseSensitive = target.sparkSession.sessionState.conf.caseSensitiveAnalysis
    def canon(n: String): String =
      if (caseSensitive) n else n.toLowerCase(java.util.Locale.ROOT)
    val have = target.columns.map(canon).toSet
    source.schema.fields.filterNot(f => have.contains(canon(f.name)))
      .foldLeft(target)((df, f) =>
        df.withColumn(f.name, org.apache.spark.sql.functions.lit(null).cast(f.dataType)))
  }

  final class Builder private[SimpleMerge] (target: DataFrame, targetName: String) {
    def using(source: DataFrame, sourceName: String = "source"): SimpleMerge =
      new SimpleMerge(target, source, targetName, sourceName, MergeOptions(keys = Nil))
  }

  /** Name-based entry point (B9) — the reference's calling convention:
    * tables addressed by `database.schema.table` strings, `#temp` names
    * routed to the temp store (sp_SimpleMerge.sql:96-119). Here `#name`
    * resolves a temp view; a qualified name resolves through the session
    * catalog. Validation mirrors the reference's gates and messages:
    * not-found first, then the qualification requirement (a bare permanent
    * name fails `parsename(...,3)` in the reference).
    */
  def intoTable(spark: SparkSession, targetName: String): NamedBuilder =
    new NamedBuilder(spark, targetName)

  final class NamedBuilder private[SimpleMerge] (spark: SparkSession, targetName: String) {
    def usingTable(sourceName: String): SimpleMerge = {
      val t = resolveTable(spark, targetName, "Target")
      val s = resolveTable(spark, sourceName, "Source")
      new SimpleMerge(t, s, targetName, sourceName, MergeOptions(keys = Nil))
    }
  }

  /** Resolve a reference-style table name against the Spark catalog. */
  private[merge] def resolveTable(spark: SparkSession, name: String, role: String): DataFrame = {
    val trimmed = Option(name).getOrElse("").trim
    if (trimmed.isEmpty)
      throw new MergeValidationException(s"$role: ${Option(name).getOrElse("")} not found.")
    val isTemp = trimmed.startsWith("#")
    val resolved = if (isTemp) trimmed.drop(1) else trimmed
    if (!spark.catalog.tableExists(resolved))
      throw new MergeValidationException(s"$role: $trimmed not found.")
    if (!isTemp && !trimmed.contains("."))
      throw new MergeValidationException(s"$role: $trimmed is invalid. Database name is required.")
    spark.table(resolved)
  }
}
