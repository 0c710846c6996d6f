package graft.merge

/** Error channel of the engine (reference: THROW 50000 for validation at
  * sp_SimpleMerge.sql:92-128,194-201; RAISERROR 16 for runtime/threshold
  * at :419,483).
  */
final class MergeValidationException(msg: String) extends IllegalArgumentException(msg)

/** Threshold breach (reference: sp_SimpleMerge.sql:478-484 — rollback and
  * report the actual variance).
  */
final class MergeThresholdExceededException(val variancePct: Double, val thresholdPct: Double)
    extends RuntimeException(
      f"Merge aborted: row change variance $variancePct%.2f%% exceeds threshold $thresholdPct%.2f%%")

/** Disposition of target rows NOT matched by source — reference `@delete`
  * parameter (sp_SimpleMerge.sql:339-346, README.md:32-36).
  */
sealed trait DeleteMode
object DeleteMode {

  /** `@delete = 'YES'` (default): WHEN NOT MATCHED BY SOURCE THEN DELETE. */
  case object Delete extends DeleteMode

  /** any other literal: clause omitted; unmatched target rows retained. */
  case object Ignore extends DeleteMode

  /** `@delete = 'set col = expr, ...'`: soft delete — WHEN NOT MATCHED BY
    * SOURCE THEN UPDATE SET assignments (sp_SimpleMerge.sql:343-345).
    */
  final case class SoftDelete(assignments: Seq[(String, String)]) extends DeleteMode

  /** Parse the reference's string-typed `@delete` parameter. */
  def parse(s: String): DeleteMode = {
    val t = Option(s).getOrElse("").trim
    if (t.equalsIgnoreCase("YES")) Delete
    else if (t.toLowerCase.startsWith("set ")) SoftDelete(parseAssignments(t.drop(4)))
    else Ignore
  }

  /** Split `a = e1, b = e2` on top-level commas (quotes and parens respected). */
  private[merge] def parseAssignments(s: String): Seq[(String, String)] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    s.foreach { ch =>
      if (quote != 0) { cur += ch; if (ch == quote) quote = 0 }
      else ch match {
        case '\'' | '"' | '`' => quote = ch; cur += ch
        case '(' => depth += 1; cur += ch
        case ')' => depth -= 1; cur += ch
        case ',' if depth == 0 => parts += cur.toString; cur.clear()
        case _ => cur += ch
      }
    }
    if (cur.nonEmpty) parts += cur.toString
    parts.toSeq.map { a =>
      val i = a.indexOf('=')
      if (i < 0) throw new MergeValidationException(s"Malformed SET assignment: '$a'")
      val col = MergePlan.stripQuotes(a.take(i).trim)
      val e = a.drop(i + 1).trim
      if (col.isEmpty || e.isEmpty)
        throw new MergeValidationException(s"Malformed SET assignment: '$a'")
      (col, e)
    }
  }
}

/** All behavioral knobs of the engine — one-to-one with the reference's
  * parameter block (sp_SimpleMerge.sql:57-67, README.md:18-47).
  *
  * @param keys         ordered key column list (`@joinColumns`); NULL keys
  *                     compare equal (README.md:20-21)
  * @param delete       not-matched-by-source disposition (`@delete`)
  * @param targetFilter SQL predicate restricting which target rows
  *                     participate (`@targetFilter`, sp_SimpleMerge.sql:205-225)
  * @param badKey       duplicate keys allowed: window row_number dedup on
  *                     both sides (`@badKey`, sp_SimpleMerge.sql:209-242)
  * @param badKeySalt   >1 = spread each key's row_number sort over this
  *                     many salt buckets (two-phase rank) so a pathological
  *                     hot key cannot pin one reducer; 0/1 = plain window.
  *                     Row order within a key is arbitrary either way —
  *                     exactly the reference's %%physloc%% contract
  *                     (README.md:23) — so results are multiset-identical.
  * @param threshold    max changed-row percentage, e.g. "15%" (`@threshold`,
  *                     sp_SimpleMerge.sql:470-484)
  * @param audit        produce per-row audit output (`@output`,
  *                     sp_SimpleMerge.sql:350-410)
  */
final case class MergeOptions(
    keys: Seq[String],
    delete: DeleteMode = DeleteMode.Delete,
    targetFilter: Option[String] = None,
    badKey: Boolean = false,
    badKeySalt: Int = 0,
    threshold: Option[String] = None,
    audit: Boolean = false) {

  /** Parse "15%" → 15.0 (reference: isnumeric/cast at sp_SimpleMerge.sql:92-95,474). */
  def thresholdPct: Option[Double] = threshold.map { raw =>
    val t = raw.stripSuffix("%").trim
    try t.toDouble
    catch {
      case _: NumberFormatException =>
        throw new MergeValidationException(s"Invalid @threshold '$raw': not a percentage")
    }
  }
}
