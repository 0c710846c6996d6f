package graft.merge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Ascending, CreateNamedStruct, EqualNullSafe, EqualTo, Expression, Not, SortOrder, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical._

/** The reference's dynamic-SQL execute boundary (B10): `sp_SimpleMerge`
  * renders MERGE text and `exec(@sql)`s it (sp_SimpleMerge.sql:471).
  * Spark parses MERGE INTO natively but — in this environment — has no
  * lakehouse table format to execute it against, so this closes the loop
  * the Spark-first way: the statement goes through Spark's OWN SQL parser
  * into its `MergeIntoTable` logical plan, the clause structure is
  * translated into [[MergeOptions]], and the same engine the DataFrame
  * API uses runs it. Round trip: [[MergeDebug.renderSql]] output parses
  * back into exactly the semantics that rendered it (the g3 query pins
  * this against m1's oracle).
  *
  * Scope: the clause structure the reference generates — named
  * target/source relations, conjunctive same-column equi / null-safe ON
  * keys, full-column UPDATE (plain or change-detected) on match, full
  * INSERT on not-matched, and DELETE / UPDATE SET / clause-absent on
  * not-matched-by-source. The targetFilter/badKey variants render as
  * CTEs; those CTE bodies are recognized structurally (a `SELECT * …
  * WHERE` slice, the `_SimpleMerge_rn` row_number window) and folded
  * BACK into the [[MergeOptions]] they rendered from, so every
  * [[MergeDebug.renderSql]] output round-trips — a CTE shape outside
  * that grammar is rejected, never reinterpreted.
  */
object MergeSql {

  /** Parse + execute, returning the post-merge target content (lazy). */
  def mergedFrame(spark: SparkSession, sqlText: String): DataFrame =
    toSimpleMerge(spark, sqlText).merged

  /** Parse + execute AGAINST AN ON-DISK TARGET, with partition routing
    * (VERDICT r12 next #6): the statement's relations still resolve
    * through the session catalog (the target view supplies the schema
    * the clause validation checks against), but the apply runs at
    * `targetPath` — and when that path carries a
    * [[PartitionedTarget]] partition-spec sidecar, it routes into the
    * partition-scoped apply, so a MERGE arriving as SQL text gets the
    * same touched-bucket pruning the DataFrame API gets (only the bucket
    * directories the source keys hash into are read, rewritten, and
    * swapped; everything else is physically untouched). A plain-parquet
    * path takes the full-rewrite apply — the same routing
    * [[graft.streaming.StreamingUpsert]] does for its sink.
    */
  def applyToTarget(
      spark: SparkSession, sqlText: String, targetPath: String,
      auditPath: Option[String] = None): MergeResult = {
    val parsed = parse(spark, sqlText)
    if (PartitionedTarget.isPartitioned(spark, targetPath)) {
      // Evolving a partitioned target bucket-by-bucket would leave the
      // untouched buckets on the OLD schema — mixed-schema directories a
      // plain read resolves arbitrarily. Rejected, never half-applied;
      // evolve + rewrite the target explicitly (PartitionedTarget.write).
      if (parsed.evolve)
        unsupported("WITH SCHEMA EVOLUTION on a partitioned target (only the " +
          "touched buckets would evolve — rewrite the target with the evolved " +
          "schema first)")
      parsed.sm.applyToPartitionedPath(spark, targetPath, auditPath)
    } else if (parsed.evolve) parsed.sm.applyToPathEvolved(spark, targetPath, auditPath)
    else parsed.sm.applyToPath(spark, targetPath, auditPath)
  }

  /** Parse a MERGE INTO statement into a configured [[SimpleMerge]] whose
    * relations resolve through the session catalog (temp views included).
    * A `MERGE WITH SCHEMA EVOLUTION INTO …` statement (the Spark 4 /
    * lakehouse opt-in syntax) applies the [[SimpleMerge.evolveTarget]]
    * pre-pass to the in-memory target — C116's explicit-decision
    * contract carried onto the SQL surface: without the keyword a
    * widened source is still rejected by the alignment gate.
    */
  def toSimpleMerge(spark: SparkSession, sqlText: String): SimpleMerge =
    parse(spark, sqlText).sm

  /** One parsed statement: the configured engine plus the
    * schema-evolution bit [[applyToTarget]] must route on (the on-disk
    * target is evolved at APPLY time, not here).
    */
  private final case class Parsed(sm: SimpleMerge, evolve: Boolean)

  private def parse(spark: SparkSession, sqlText: String): Parsed = {
    val (m, ctes) = spark.sessionState.sqlParser.parsePlan(sqlText) match {
      case m: MergeIntoTable => (m, Map.empty[String, LogicalPlan])
      case w: UnresolvedWith => w.child match {
        case m: MergeIntoTable =>
          (m, w.cteRelations.map(r => r._1.toLowerCase -> (r._2: LogicalPlan)).toMap)
        case other => notMerge(other)
      }
      case other => notMerge(other)
    }
    val tRef = relationName(m.targetTable, "target")
    val sRef = relationName(m.sourceTable, "source")
    val tSide = ctes.get(tRef.toLowerCase).map(parseCteSide("target", _))
      .getOrElse(SideSpec(tRef, None, None))
    val sSide = ctes.get(sRef.toLowerCase).map(parseCteSide("source", _))
      .getOrElse(SideSpec(sRef, None, None))
    if (ctes.size > Seq(tRef, sRef).count(r => ctes.contains(r.toLowerCase)))
      unsupported(s"CTEs not referenced by the MERGE (${ctes.keys.mkString(", ")})")
    if (sSide.filter.isDefined)
      unsupported("a filtered SOURCE CTE (the engine filters the target slice only)")
    val tName = tSide.name
    val sName = sSide.name

    val rawKeys = keyColumns(m.mergeCondition)
    val keys = rawKeys.filterNot(_.equalsIgnoreCase(RnCol))
    val rnOn = rawKeys.length > keys.length
    val badKey = tSide.rnKeys.isDefined
    // badKey is all-or-nothing: both CTE windows, partitioned by the ON
    // keys, plus the rn tiebreak term — anything partial is off-contract.
    if (badKey != sSide.rnKeys.isDefined || badKey != rnOn)
      unsupported(s"inconsistent $RnCol dedup shape (both CTEs must window " +
        "and the ON must carry the rn tiebreak — the @badKey render)")
    if (badKey) {
      val keySet = keys.map(_.toLowerCase).toSet
      for (side <- Seq(tSide, sSide); rk <- side.rnKeys)
        if (rk.map(_.toLowerCase).toSet != keySet)
          unsupported(s"$RnCol window partitioned by [${rk.mkString(", ")}] " +
            s"!= merge keys [${keys.mkString(", ")}]")
    }

    // The engine's clause semantics are schema-derived (MergePlan): the
    // UPDATE set is ALL shared non-key columns, the INSERT list ALL
    // source columns. A statement naming a smaller set would execute
    // with the engine's full-column semantics — so completeness is part
    // of the validation contract, not just per-assignment identity.
    val insertSet = spark.table(sName).schema.fieldNames.map(_.toLowerCase).toSet
    val updateSet = insertSet -- keys.map(_.toLowerCase)
    validateMatched(m.matchedActions, updateSet)
    validateNotMatched(m.notMatchedActions, insertSet)
    val deleteMode = m.notMatchedBySourceActions match {
      case Seq() => DeleteMode.Ignore
      case Seq(DeleteAction(None)) => DeleteMode.Delete
      case Seq(UpdateAction(None, assignments, _)) =>
        DeleteMode.SoftDelete(assignments.map(a => (attrName(a.key, "SET target"), a.value.sql)))
      case other => unsupported(s"WHEN NOT MATCHED BY SOURCE actions $other")
    }

    val targetFrame =
      if (m.withSchemaEvolution)
        SimpleMerge.evolveTarget(spark.table(tName), spark.table(sName))
      else spark.table(tName)
    val base = SimpleMerge.into(targetFrame, tName)
      .using(spark.table(sName), sName)
      .keys(keys: _*)
      .deleteMode(deleteMode)
      .badKey(badKey)
    Parsed(tSide.filter.fold(base)(base.targetFilter), m.withSchemaEvolution)
  }

  private val RnCol = "_SimpleMerge_rn"

  /** One merge side after CTE resolution: the REAL relation name, the
    * `WHERE` slice (targetFilter), and — when the badKey window is
    * present — its partition keys.
    */
  private final case class SideSpec(
      name: String, filter: Option[String], rnKeys: Option[Seq[String]])

  /** Structural parse of a render-grammar CTE body:
    * `SELECT * FROM t [WHERE f]`, optionally wrapped in the badKey
    * `row_number() OVER (PARTITION BY keys ORDER BY
    * monotonically_increasing_id()) AS _SimpleMerge_rn` projection.
    * Anything else is rejected — a CTE carrying other semantics must not
    * silently degrade to a plain scan.
    */
  private def parseCteSide(role: String, plan: LogicalPlan): SideSpec = plan match {
    case SubqueryAlias(_, child) => parseCteSide(role, child)
    case Project(Seq(_: UnresolvedStar), inner) => baseSlice(role, inner)
    case Project(Seq(_: UnresolvedStar, Alias(we: WindowExpression, RnCol)), inner) =>
      val base = parseCteSide(role, inner)
      if (base.rnKeys.isDefined) unsupported(s"nested $RnCol windows in the $role CTE")
      base.copy(rnKeys = Some(windowKeys(role, we)))
    case other =>
      unsupported(s"$role CTE shape ${other.nodeName} (expected SELECT * " +
        s"[+ the $RnCol window] FROM <table> [WHERE <filter>])")
  }

  private def baseSlice(role: String, inner: LogicalPlan): SideSpec = inner match {
    case Filter(cond, r: UnresolvedRelation) =>
      SideSpec(r.multipartIdentifier.mkString("."), Some(cond.sql), None)
    case r: UnresolvedRelation =>
      SideSpec(r.multipartIdentifier.mkString("."), None, None)
    case other =>
      unsupported(s"$role CTE base ${other.nodeName} (expected <table> [WHERE <filter>])")
  }

  /** Validate the badKey window is EXACTLY the render's dedup shape and
    * return its partition key names.
    */
  private def windowKeys(role: String, we: WindowExpression): Seq[String] = {
    we.windowFunction match {
      case f: UnresolvedFunction if f.nameParts.map(_.toLowerCase) == Seq("row_number")
        && f.arguments.isEmpty => ()
      case other => unsupported(s"$role $RnCol window function ${other.sql} (expected row_number())")
    }
    we.windowSpec match {
      case WindowSpecDefinition(partitionSpec, Seq(SortOrder(of: UnresolvedFunction, Ascending, _, _)), _)
          if of.nameParts.map(_.toLowerCase) == Seq("monotonically_increasing_id") =>
        partitionSpec.map(attrName(_, s"$role $RnCol partition key"))
      case other =>
        unsupported(s"$role $RnCol window spec ${other.sql} " +
          "(expected PARTITION BY <keys> ORDER BY monotonically_increasing_id())")
    }
  }

  private def notMerge(other: LogicalPlan): Nothing =
    throw new MergeValidationException(
      s"Not an executable MERGE INTO statement (parsed ${other.nodeName})")

  private def unsupported(what: String): Nothing =
    throw new MergeValidationException(
      s"Unsupported MERGE clause for the SimpleMerge engine: $what")

  private def relationName(p: LogicalPlan, role: String): String = p match {
    case SubqueryAlias(_, r: UnresolvedRelation) => r.multipartIdentifier.mkString(".")
    case r: UnresolvedRelation => r.multipartIdentifier.mkString(".")
    case other => unsupported(s"$role relation ${other.nodeName} (expected a named table/view)")
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  private def attrName(e: Expression, role: String): String = e match {
    case a: UnresolvedAttribute => a.nameParts.last
    case other => unsupported(s"$role expression ${other.sql} (expected a column reference)")
  }

  /** ON must be a conjunction of same-column `t.k = s.k` / `t.k <=> s.k`
    * terms — the only join shape the engine (and the reference) keys on.
    * `<=>` vs `=` carries no information here: [[MergePlan]] derives
    * null-safety from the target schema, exactly as the renderer did.
    */
  private def keyColumns(cond: Expression): Seq[String] =
    conjuncts(cond).map {
      case EqualTo(a, b) => sameColumn(a, b)
      case EqualNullSafe(a, b) => sameColumn(a, b)
      case other => unsupported(s"ON term ${other.sql} (expected t.k = s.k or t.k <=> s.k)")
    }

  private def sameColumn(a: Expression, b: Expression): String = {
    val (an, bn) = (attrName(a, "ON left"), attrName(b, "ON right"))
    if (!an.equalsIgnoreCase(bn))
      unsupported(s"ON term joining different columns $an / $bn (merge keys are same-named)")
    an
  }

  /** WHEN MATCHED must be the engine's update shape: one UPDATE whose
    * assignments are identity `t.c = s.c` pairs covering EVERY shared
    * non-key column (or `UPDATE SET *`), optionally guarded by the
    * change-detect idiom (`struct(s.*) IS DISTINCT FROM struct(t.*)`,
    * which parses to `Not(EqualNullSafe(...))` over full-row structs).
    * The engine change-detects regardless (A10 suppresses no-op
    * updates), so the guarded and unguarded spellings execute
    * identically — what must be rejected is a PARTIAL or renaming SET,
    * and a column-level guard, whose SQL semantics (update only that
    * column / only when that column changed) the engine does not
    * implement. A MERGE with no WHEN MATCHED is accepted only when the
    * update set is empty (all-key source — the render the engine itself
    * produces there, A12).
    */
  private def validateMatched(actions: Seq[MergeAction], expected: Set[String]): Unit =
    actions match {
      case Seq() if expected.isEmpty => () // all-key source: clause suppressed
      case Seq() =>
        unsupported("absence of a WHEN MATCHED clause (the engine always " +
          "updates changed matches; matched suppression is schema-driven, not clause-driven)")
      case Seq(UpdateStarAction(cond)) =>
        validateMatchedCondition(cond, expected)
      case Seq(UpdateAction(cond, assignments, _)) =>
        validateMatchedCondition(cond, expected)
        val setCols = assignments.map { a =>
          val (k, v) = (attrName(a.key, "SET target"), attrName(a.value, "SET value"))
          if (!k.equalsIgnoreCase(v))
            unsupported(s"renaming SET $k = $v (the engine updates columns in place)")
          k.toLowerCase
        }
        if (setCols.toSet != expected)
          unsupported(s"partial SET over [${setCols.sorted.mkString(", ")}] — the engine " +
            s"updates ALL shared non-key columns [${expected.toSeq.sorted.mkString(", ")}]; " +
            "executing a narrower SET with full-column semantics would be a silent reinterpretation")
      case other => unsupported(s"WHEN MATCHED actions $other")
    }

  /** The change-detect guard must be the FULL-ROW idiom: both operands
    * struct(...) over exactly the update column set. A single-column
    * `t.c IS DISTINCT FROM s.c` guard means "update only when THAT
    * column changed" — different semantics from the engine's all-column
    * change detection, so it is rejected, not reinterpreted.
    */
  private def validateMatchedCondition(cond: Option[Expression], expected: Set[String]): Unit =
    cond match {
      case None => ()
      case Some(Not(EqualNullSafe(l, r))) =>
        val (ln, rn) = (structCols(l).map(_.toLowerCase), structCols(r).map(_.toLowerCase))
        if (ln.toSet != expected || rn.toSet != expected)
          unsupported(s"WHEN MATCHED change guard over [${(ln ++ rn).distinct.sorted.mkString(", ")}] " +
            s"(the engine change-detects over ALL shared non-key columns " +
            s"[${expected.toSeq.sorted.mkString(", ")}])")
      case Some(other) => unsupported(s"WHEN MATCHED condition ${other.sql}")
    }

  /** Field names of a `struct(...)` operand in the unresolved parse tree
    * (`UnresolvedFunction("struct", ...)`; `CreateNamedStruct` accepted
    * for programmatically-built plans). Anything else — in particular a
    * bare column reference — is not the change-detect idiom.
    */
  private def structCols(e: Expression): Seq[String] = e match {
    case f: UnresolvedFunction
        if f.nameParts.map(_.toLowerCase) == Seq("struct") && f.arguments.nonEmpty =>
      f.arguments.map(attrName(_, "change-guard struct field"))
    case s: CreateNamedStruct => s.names.map(_.toString)
    case other =>
      unsupported(s"WHEN MATCHED change-guard operand ${other.sql} " +
        "(expected struct(...) over the update columns)")
  }

  /** WHEN NOT MATCHED must be the full same-named INSERT (or INSERT *):
    * every source column named, none renamed — a partial INSERT would
    * execute as the engine's full-column insert (NULLs the SQL semantics
    * would leave are not what the engine does).
    */
  private def validateNotMatched(actions: Seq[MergeAction], expected: Set[String]): Unit =
    actions match {
      case Seq() =>
        unsupported("absence of a WHEN NOT MATCHED clause (the engine always inserts new keys)")
      case Seq(InsertStarAction(None)) => ()
      case Seq(InsertAction(None, assignments)) =>
        val insCols = assignments.map { a =>
          val (k, v) = (attrName(a.key, "INSERT target"), attrName(a.value, "INSERT value"))
          if (!k.equalsIgnoreCase(v))
            unsupported(s"reordering/renaming INSERT $k = $v")
          k.toLowerCase
        }
        if (insCols.toSet != expected)
          unsupported(s"partial INSERT over [${insCols.sorted.mkString(", ")}] — the engine " +
            s"inserts ALL source columns [${expected.toSeq.sorted.mkString(", ")}]; " +
            "executing a narrower list with full-column semantics would be a silent reinterpretation")
      case other => unsupported(s"WHEN NOT MATCHED actions $other")
    }
}
