package graft.merge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type-2 merge — the history-preserving variant
  * of the snapshot merge (reference semantics: `sp_SimpleMerge.sql`'s
  * update/insert/delete dispositions, re-expressed so no information is
  * ever overwritten). Where [[MergeFrame]] REPLACES a matched-and-changed
  * row, SCD2 CLOSES it (`validTo` = the new version, `isCurrent` = false)
  * and appends the source truth as a fresh current row; where the A-family
  * DELETE drops a key that left the source, SCD2 closes its current row
  * and keeps it queryable. Historical (already-closed) rows never
  * participate in matching — they pass through untouched.
  *
  * Dispositions, per business key among the CURRENT target rows:
  *   - matched, payload unchanged → row passes through (still current);
  *   - matched, payload changed   → two rows out: the old row closed at
  *     `version`, the source row opened at `version`;
  *   - in target only             → closed at `version` (when
  *     `closeMissing`; otherwise passes through — the `delete("NO")`
  *     twin);
  *   - in source only             → opened at `version`.
  *
  * Scale shape: ONE shuffle — the null-safe full-outer join on the
  * business key (AQE broadcasts a small snapshot side). The 1-or-2-row
  * fan-out is a map-side `explode` over an inline struct array, so the
  * whole disposition stage stays in one whole-stage-codegen span; the
  * closed-history union is scan + union, no shuffle. Cost ∝ |current| +
  * |snapshot|, independent of accumulated history depth when the at-rest
  * table is stored partitioned by `isCurrent` (the normal SCD2 layout —
  * the history partition is never read).
  */
object Scd2 {

  /** Apply snapshot `source` to SCD2 history `target` at `version`.
    *
    * @param target  history frame: business payload + `fromCol` (bigint),
    *                `toCol` (bigint, null = open), `curCol` (boolean).
    * @param source  snapshot frame: exactly the business payload columns.
    * @param keys    business key columns (null-safe matched).
    * @param version stamp written to closed rows' `toCol` and new rows'
    *                `fromCol`; must be monotone across applies.
    * @param closeMissing close current rows whose key left the snapshot
    *                (the DELETE disposition); false = keep them current.
    */
  def apply(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      version: Long,
      fromCol: String = "valid_from",
      toCol: String = "valid_to",
      curCol: String = "is_current",
      closeMissing: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "at least one key column required")
    val meta = Set(fromCol, toCol, curCol)
    val payload = target.columns.filterNot(meta.contains).toSeq
    require(
      source.columns.toSet == payload.toSet,
      s"source columns ${source.columns.toSet} must equal target payload ${payload.toSet}")
    require(payload.forall(!meta.contains(_)) && target.columns.toSet.size == target.columns.length,
      "ambiguous target columns")

    val history = target.filter(!col(curCol))
    val current = target.filter(col(curCol)).alias("t")
    val snap = source.alias("s")
    val t = (c: String) => col(s"t.$c")
    val s = (c: String) => col(s"s.$c")

    val joinCond = keys.map(k => t(k) <=> s(k)).reduce(_ && _)
    // Presence markers, not key-null tests: a null business key is a
    // legitimate (null-safe matched) key value here, as in MergeFrame.
    val joined = current.withColumn("__t_p", lit(1))
      .join(snap.withColumn("__s_p", lit(1)), joinCond, "full_outer")

    val changed = payload.filterNot(keys.contains)
      .map(c => !(t(c) <=> s(c)))
      .reduceOption(_ || _)
      .getOrElse(lit(false))

    def row(cols: String => Column, from: Column, to: Column, cur: Column) =
      struct(payload.map(c => cols(c).as(c)) ++
        Seq(from.cast("bigint").as(fromCol), to.cast("bigint").as(toCol),
          cur.as(curCol)): _*)

    val tOpen = row(t, t(fromCol), t(toCol), lit(true))
    val tClosed = row(t, t(fromCol), lit(version), lit(false))
    val sOpen = row(s, lit(version), lit(null), lit(true))

    val fanOut =
      when(col("__s_p").isNull, if (closeMissing) array(tClosed) else array(tOpen))
        .when(col("__t_p").isNull, array(sOpen))
        .when(changed, array(tClosed, sOpen))
        .otherwise(array(tOpen))

    joined.select(explode(fanOut).as("__r")).select(col("__r.*"))
      .unionByName(history)
  }

  /** Point-in-time reconstruction — the read side SCD2 exists for:
    * the business snapshot as it stood AT `version`. A row is visible
    * when its validity interval covers the version: `valid_from <=
    * version < valid_to` (open rows have null `valid_to` = ∞). Returns
    * payload columns only — the caller asked for a snapshot, not
    * history bookkeeping. Map-only filter + projection: at most one row
    * per key qualifies by the non-overlapping-intervals invariant
    * [[apply]] maintains, so no window or dedup is needed — and on the
    * normal `is_current`-partitioned layout, `snapshotAt(latest)`
    * prunes to the current partition alone.
    */
  def snapshotAt(
      target: DataFrame,
      version: Long,
      fromCol: String = "valid_from",
      toCol: String = "valid_to",
      curCol: String = "is_current"): DataFrame = {
    val payload = target.columns.filterNot(Set(fromCol, toCol, curCol).contains)
    target
      .filter(col(fromCol) <= version && (col(toCol).isNull || col(toCol) > version))
      .select(payload.map(col): _*)
  }

  /** Point-in-time (PIT) enrichment: attach to each FACT row the history
    * version that was valid AT the fact's own timestamp — the
    * leakage-safe feature attach a training pipeline needs (attribute
    * values from after the event must never reach the example; joining
    * the CURRENT dimension — st8's shape — is exactly that leak).
    * [[snapshotAt]] answers "the whole table as of one version"; this
    * answers "each row as of ITS OWN version", the feature-store
    * `ASOF`/PIT-join contract.
    *
    * Facts whose key has no version valid at their timestamp (key absent
    * from the history, or the timestamp predates its first version) drop
    * out — inner semantics, the honest default for features (an example
    * without a feature value is a gap to handle explicitly, not a NULL
    * to train on silently).
    *
    * Scale shape: ONE equi-join shuffle on the business key — Catalyst
    * extracts the `<=>` key conjuncts as the hash-join keys and applies
    * the interval bounds as the join filter, so there is NO range-join
    * fan-out and NO per-fact window; AQE broadcasts a dim-sized history.
    * For well-formed histories ([[apply]]'s output: per-key intervals
    * disjoint, one open row) the filter passes at most one history row
    * per fact, so output ≤ facts. Cost ∝ |facts| + |history| — and
    * history depth only enters through the join's build side, not
    * through any per-fact scan.
    */
  def enrichAsOf(
      facts: DataFrame,
      history: DataFrame,
      joinKeys: Seq[(String, String)],
      tsCol: String,
      fromCol: String = "valid_from",
      toCol: String = "valid_to"): DataFrame = {
    require(joinKeys.nonEmpty, "at least one join key required")
    val cond = joinKeys.map { case (f, h) => facts(f) <=> history(h) }
      .reduce(_ && _) &&
      facts(tsCol) >= history(fromCol) &&
      (history(toCol).isNull || facts(tsCol) < history(toCol))
    joinKeys.foldLeft(facts.join(history, cond, "inner")) {
      case (df, (_, h)) => df.drop(history(h))
    }.drop(history(fromCol)).drop(history(toCol))
  }
}
