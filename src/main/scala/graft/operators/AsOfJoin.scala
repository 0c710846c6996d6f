package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of (temporal nearest) join — an operator Spark lacks natively,
  * composed from existing primitives per the engine's preference order
  * (compose > custom plan): tag both sides, union, and resolve each left
  * row's match with a running `last(ignoreNulls)` window over the shared
  * key+time ordering. ONE shuffle on the key — the same movement a native
  * as-of join would need — with no range-explosion join, no per-key
  * collect, and window state bounded to a single struct per row.
  *
  *   - [[backward]]: greatest right ts <= left ts (attribution joins)
  *   - [[forward]]:  smallest right ts >= left ts
  *
  * Ties (right ts == left ts) are inclusive — the right row sorts before
  * the left row at the same timestamp. NULL timestamps never match
  * (NULLs sort to the unmatched end of each ordering). Duplicate right
  * rows on the exact same (key, ts) resolve to the one last in window
  * order — callers needing strict determinism there should pre-dedupe.
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, keys: Seq[String], leftTs: String, rightTs: String): DataFrame =
    joined(left, right, keys, leftTs, rightTs, forwardDir = false, tolerance = None)

  def forward(left: DataFrame, right: DataFrame, keys: Seq[String], leftTs: String, rightTs: String): DataFrame =
    joined(left, right, keys, leftTs, rightTs, forwardDir = true, tolerance = None)

  /** [[backward]] with a maximum allowed gap (pandas `merge_asof`
    * tolerance): the nearest-at-or-before match is kept only when
    * `leftTs - rightTs <= tolerance`; a farther match nulls the payload
    * but the left row survives (left-join contract). `tolerance` is
    * compared against the timestamp difference, so pass an interval
    * (`expr("INTERVAL 30 MINUTES")`) for timestamp columns or a numeric
    * literal for numeric ones. Attribution windows are the canonical use:
    * a click six days before a purchase should not claim it. */
  def backwardWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, tolerance: Column): DataFrame =
    joined(left, right, keys, leftTs, rightTs, forwardDir = false, Some(tolerance))

  /** [[forward]] bounded by `rightTs - leftTs <= tolerance`. */
  def forwardWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, tolerance: Column): DataFrame =
    joined(left, right, keys, leftTs, rightTs, forwardDir = true, Some(tolerance))

  private def joined(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      forwardDir: Boolean,
      tolerance: Option[Column]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightPayload = right.columns.toSeq.filterNot(keys.contains)
    val collisions = rightPayload.intersect(leftCols)
    require(collisions.isEmpty, s"right payload columns collide with left: ${collisions.mkString(",")} — rename before joining")
    // Internal working names live under the engine-wide reserved __graft_
    // prefix; reject inputs that collide, mirroring MergePlan's gate, so a
    // user column named like an internal produces a clear error instead of
    // an opaque duplicate-column AnalysisException (ADVICE r2 #4).
    val reserved = (leftCols ++ right.columns).filter(_.toLowerCase.startsWith("__graft_"))
    require(reserved.isEmpty,
      s"Column [${reserved.head}] uses the reserved __graft_ prefix — rename before joining")

    val lType = StructType(left.schema.fields)
    // The carried match is (right ts, payload struct): the ts rides along
    // so a tolerance can price the gap AFTER window resolution — nearest
    // match first, then "was it close enough", exactly merge_asof's order
    // of operations (a tolerance must never fall back to a farther row).
    val rType = StructType(Seq(
      StructField("__graft_asof_rts", right.schema(rightTs).dataType),
      StructField("__graft_asof_p",
        StructType(right.schema.fields.filterNot(f => keys.contains(f.name))))))

    // Null-ts right rows can never match; null-KEY right rows must not
    // either (window partitioning would group NULL keys together, but SQL
    // equi-join/ASOF semantics — and the DuckDB oracle — never match
    // NULLs). An empty key list is the keyless single-timeline as-of join:
    // the window below becomes global.
    val keysNotNull = keys.map(col(_).isNotNull).reduceOption(_ && _).getOrElse(lit(true))
    val rTagged = right
      .filter(keysNotNull && col(rightTs).isNotNull)
      .select(
        keys.map(col) ++ Seq(
          col(rightTs).as("__graft_asof_ord"),
          lit(0).as("__graft_asof_side"),
          struct(
            col(rightTs).as("__graft_asof_rts"),
            struct(rightPayload.map(col): _*).as("__graft_asof_p")).as("__graft_asof_r"),
          lit(null).cast(lType).as("__graft_asof_l")): _*)
    val lTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__graft_asof_ord"),
        lit(1).as("__graft_asof_side"),
        lit(null).cast(rType).as("__graft_asof_r"),
        struct(leftCols.map(col): _*).as("__graft_asof_l")): _*)

    // Backward: ascending time. Forward: descending time, so "preceding"
    // rows are the later ones. Null LEFT timestamps sort first either way —
    // at the window start they see no right rows, i.e. they never match.
    val ord: Column = if (forwardDir) col("__graft_asof_ord").desc_nulls_first else col("__graft_asof_ord").asc_nulls_first
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ord, col("__graft_asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val m = col("__graft_asof_m")
    val withinTol = tolerance match {
      case None => lit(true)
      case Some(tol) =>
        val gap =
          if (forwardDir) m("__graft_asof_rts") - col("__graft_asof_ord")
          else col("__graft_asof_ord") - m("__graft_asof_rts")
        gap <= tol // null match → null gap → false: payload stays null
    }
    rTagged.unionByName(lTagged)
      .withColumn("__graft_asof_m", last(col("__graft_asof_r"), ignoreNulls = true).over(w))
      .filter(col("__graft_asof_side") === 1)
      .select(leftCols.map(c => col("__graft_asof_l." + c).as(c)) ++
        rightPayload.map(c => when(withinTol, m("__graft_asof_p")(c)).as(c)): _*)
  }
}
