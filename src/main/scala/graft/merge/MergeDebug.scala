package graft.merge

import org.apache.spark.sql.types.{StructField, StructType, TimestampType, StringType}

/** Debug/dry-run rendering — the reference's `@debug = 1` grid
  * (sp_SimpleMerge.sql:421-465, README.md:13-17): the generated statement
  * text plus the audit table DDL, without executing anything. We render the
  * merge as equivalent Spark SQL (MERGE INTO dialect) so a human can eyeball
  * the semantics the DataFrame pipeline implements.
  */
object MergeDebug {

  private def q(name: String): String = s"`${name.replace("`", "``")}`"

  /** Render the merge as a MERGE INTO statement in Spark SQL dialect —
    * faithful to the clause structure the reference generates
    * (README.md:60-101): CTE-wrapped filter/dedup, null-safe ON, INTERSECT-
    * style change detection (spelled `IS DISTINCT FROM` on a struct), the
    * three WHEN clauses, and the audit OUTPUT columns as a comment block.
    */
  def renderSql(plan: MergePlan, targetName: String, sourceName: String): String = {
    val o = plan.options
    val keys = plan.keyCols
    val payload = plan.payloadCols
    val sb = new StringBuilder

    def cteFor(name: String, alias: String, filter: Option[String]): String = {
      val base = filter.map(f => s"SELECT * FROM $name WHERE $f").getOrElse(s"SELECT * FROM $name")
      if (o.badKey) {
        val part = keys.map(k => q(k.name)).mkString(", ")
        s"$alias AS (SELECT *, row_number() OVER (PARTITION BY $part ORDER BY monotonically_increasing_id()) AS _SimpleMerge_rn FROM ($base))"
      } else filter.map(_ => s"$alias AS ($base)").getOrElse("")
    }

    val ctes = Seq(
      cteFor(targetName, "target", o.targetFilter),
      if (o.badKey) cteFor(sourceName, "source", None) else ""
    ).filter(_.nonEmpty)
    if (ctes.nonEmpty) sb.append("WITH ").append(ctes.mkString(",\n     ")).append("\n")

    val tgtRef = if (ctes.exists(_.startsWith("target"))) "target" else targetName
    val srcRef = if (o.badKey) "source" else sourceName
    sb.append(s"MERGE INTO $tgtRef AS t\nUSING $srcRef AS s\n")

    val on = keys.map { k =>
      if (k.nullable) s"t.${q(k.name)} <=> s.${q(k.name)}" else s"t.${q(k.name)} = s.${q(k.name)}"
    } ++ (if (o.badKey) Seq("t._SimpleMerge_rn = s._SimpleMerge_rn") else Nil)
    sb.append("ON ").append(on.mkString("\n   AND ")).append("\n")

    if (plan.hasMatchedClause) {
      val sStruct = payload.map(c => s"s.${q(c.name)}").mkString("struct(", ", ", ")")
      val tStruct = payload.map(c => s"t.${q(c.name)}").mkString("struct(", ", ", ")")
      sb.append(s"WHEN MATCHED AND $sStruct IS DISTINCT FROM $tStruct THEN UPDATE SET\n")
      sb.append(payload.map(c => s"  t.${q(c.name)} = s.${q(c.name)}").mkString(",\n")).append("\n")
    }
    val insCols = plan.sourceCols.map(c => q(c.name)).mkString(", ")
    val insVals = plan.sourceCols.map(c => s"s.${q(c.name)}").mkString(", ")
    sb.append(s"WHEN NOT MATCHED THEN INSERT ($insCols) VALUES ($insVals)\n")
    o.delete match {
      case DeleteMode.Delete =>
        sb.append("WHEN NOT MATCHED BY SOURCE THEN DELETE\n")
      case DeleteMode.SoftDelete(as) =>
        sb.append("WHEN NOT MATCHED BY SOURCE THEN UPDATE SET ")
        sb.append(as.map { case (c, e) => s"t.${q(c)} = $e" }.mkString(", ")).append("\n")
      case DeleteMode.Ignore => ()
    }
    sb.toString
  }

  /** Schema of the audit OUTPUT table (A17/B11): actionTime, action, keys,
    * then nullable before-images (d_*) for every non-key TARGET column in
    * target-ordinal order followed by the after-images (i_*) — the
    * reference's OUTPUT layout (sp_SimpleMerge.sql:362-409: all deleted.*
    * then all inserted.*, ordered by targetId). Images omitted entirely
    * when no matched clause exists (:362,392).
    */
  def auditSchema(plan: MergePlan): StructType = {
    val keyFields = plan.keyCols.map(c => StructField(c.name, c.dataType, c.nullable))
    val nonKey = plan.targetCols.filterNot(_.isKey)
    val images =
      if (!plan.hasMatchedClause) Nil
      else nonKey.map(c => StructField("d_" + c.name, c.dataType, nullable = true)) ++
        nonKey.map(c => StructField("i_" + c.name, c.dataType, nullable = true))
    StructType(
      Seq(StructField("actionTime", TimestampType, nullable = false),
        StructField("action", StringType, nullable = false)) ++ keyFields ++ images)
  }

  /** The audit table CREATE TABLE DDL the reference prints in debug mode
    * (sp_SimpleMerge.sql:432-462), rendered in Spark DDL.
    */
  def auditDdl(plan: MergePlan, tableName: String): String =
    s"CREATE TABLE $tableName (${auditSchema(plan).toDDL})"
}
