package graft.merge

import org.apache.spark.sql.types.{DataType, StructType}

/** One row of the reference's `#columnList` metadata table
  * (sp_SimpleMerge.sql:154-161): the unified column alignment of source
  * schema × target schema × key list.
  *
  * @param name        target-cased column name
  * @param sourceName  source-cased spelling of the same column, if present
  *                    there — source reads must use THIS name so the engine
  *                    works under spark.sql.caseSensitive=true even though
  *                    alignment is case-insensitive
  * @param sourceIdx   ordinal in source schema, if present there
  * @param targetIdx   ordinal in target schema, if present there
  * @param joinOrdinal position in the key list, if a key column
  */
final case class ColumnSpec(
    name: String,
    sourceName: Option[String],
    sourceIdx: Option[Int],
    targetIdx: Option[Int],
    joinOrdinal: Option[Int],
    dataType: DataType,
    nullable: Boolean) {
  def isKey: Boolean = joinOrdinal.isDefined
  def inSource: Boolean = sourceIdx.isDefined
}

/** Validated merge plan: the schema-alignment + validation layer of the
  * engine (reference generator stages, sp_SimpleMerge.sql:151-201). Pure
  * metadata — no Spark session needed, unit-testable standalone.
  */
final case class MergePlan(specs: Seq[ColumnSpec], options: MergeOptions) {

  /** Key columns in `@joinColumns` order. */
  def keyCols: Seq[ColumnSpec] = specs.filter(_.isKey).sortBy(_.joinOrdinal.get)

  /** Non-key columns present in the source — the UPDATE set
    * (sp_SimpleMerge.sql:298-308).
    */
  def payloadCols: Seq[ColumnSpec] =
    specs.filter(c => c.inSource && !c.isKey).sortBy(_.sourceIdx.get)

  /** Target-only columns: preserved on update, NULL on insert (README.md:27-29). */
  def targetOnlyCols: Seq[ColumnSpec] = specs.filter(c => !c.inSource)

  /** Source columns in source-schema order (INSERT column list,
    * sp_SimpleMerge.sql:316-338).
    */
  def sourceCols: Seq[ColumnSpec] = specs.filter(_.inSource).sortBy(_.sourceIdx.get)

  /** Target columns in target-schema order (output schema of the merge). */
  def targetCols: Seq[ColumnSpec] = specs.sortBy(_.targetIdx.get)

  /** WHEN MATCHED clause is suppressed when every source column is a key
    * (sp_SimpleMerge.sql:275, README.md:18-19).
    */
  def hasMatchedClause: Boolean = payloadCols.nonEmpty
}

object MergePlan {

  /** Align source/target schemas with the key list — the reference's double
    * full-outer join into `#columnList` (sp_SimpleMerge.sql:187-191) plus its
    * four validation gates (:194-201). Name matching is case-insensitive,
    * like SQL Server's default collation.
    */
  def build(targetSchema: StructType, sourceSchema: StructType, options: MergeOptions): MergePlan = {
    if (options.keys.isEmpty)
      throw new MergeValidationException("@joinColumns must name at least one key column")
    val keyList = options.keys.map(_.trim).map(stripQuotes)
    val tByName = targetSchema.fields.zipWithIndex.map { case (f, i) => f.name.toLowerCase -> (f, i) }.toMap
    val sByName = sourceSchema.fields.zipWithIndex.map { case (f, i) => f.name.toLowerCase -> (f, i) }.toMap
    val keyOrd = keyList.zipWithIndex.map { case (k, i) => k.toLowerCase -> i }.toMap
    if (keyOrd.size != keyList.size)
      throw new MergeValidationException(s"Duplicate key column in @joinColumns: ${keyList.mkString(",")}")

    // gate: key column missing from source / target (sp_SimpleMerge.sql:196-199)
    keyList.foreach { k =>
      if (!sByName.contains(k.toLowerCase))
        throw new MergeValidationException(s"Specified join column [$k] missing from source")
      if (!tByName.contains(k.toLowerCase))
        throw new MergeValidationException(s"Specified join column [$k] missing from target")
    }
    // gate: source column missing from target (sp_SimpleMerge.sql:200-201)
    sourceSchema.fields.foreach { f =>
      if (!tByName.contains(f.name.toLowerCase))
        throw new MergeValidationException(s"Specified source column [${f.name}] missing from target")
    }
    // gate: internal marker namespace must stay free (MergeFrame prefixes
    // source columns and adds marker columns under __graft_*; a user column
    // there would silently collide with engine state).
    (targetSchema.fields ++ sourceSchema.fields).foreach { f =>
      if (f.name.toLowerCase.startsWith("__graft_"))
        throw new MergeValidationException(
          s"Column [${f.name}] uses the reserved __graft_ prefix")
    }
    // gate: aligned columns must be type-identical or safely up-castable —
    // otherwise the staged rewrite would silently drift the target schema
    // (the reference's MERGE fails on incompatible types instead).
    sourceSchema.fields.foreach { f =>
      val (tf, _) = tByName(f.name.toLowerCase)
      if (f.dataType != tf.dataType &&
        !org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(f.dataType, tf.dataType))
        throw new MergeValidationException(
          s"Source column [${f.name}] type ${f.dataType.simpleString} is not compatible " +
            s"with target type ${tf.dataType.simpleString}")
    }

    val specs = targetSchema.fields.zipWithIndex.map { case (f, ti) =>
      val lower = f.name.toLowerCase
      ColumnSpec(
        name = f.name,
        sourceName = sByName.get(lower).map(_._1.name),
        sourceIdx = sByName.get(lower).map(_._2),
        targetIdx = Some(ti),
        joinOrdinal = keyOrd.get(lower),
        dataType = f.dataType,
        nullable = f.nullable)
    }
    MergePlan(specs.toIndexedSeq, options)
  }

  private[merge] def stripQuotes(s: String): String =
    s.stripPrefix("[").stripSuffix("]").stripPrefix("`").stripSuffix("`")
}
