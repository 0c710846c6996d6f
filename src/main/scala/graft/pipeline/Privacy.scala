package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity over quasi-identifiers (Sweeney 2002) — the structural
  * privacy gate that complements content-level PII scrubbing (C28):
  * scrubbing removes identifiers WRITTEN IN the text, but a row whose
  * quasi-identifier combination (segment × region × bucketed age …) is
  * shared by fewer than k records re-identifies its subject by JOIN
  * against any public table carrying the same attributes — the attack
  * redaction cannot stop. Training corpora assembled from user data
  * carry exactly this risk in their metadata columns.
  *
  * Both operations are one hash aggregation + (for the gate) one
  * semi-join keyed by the same quasi columns: equivalence-class sizes
  * partial-aggregate map-side, the class frame is |distinct combos|
  * rows (tiny vs the corpus), and AQE broadcasts it when it fits — no
  * row-level window, no second full shuffle. Suppression (dropping the
  * rare rows) is the k-anonymity mechanism that never alters surviving
  * values, so downstream exactness is untouched — generalization
  * ladders can sit on top as plain column expressions.
  */
object Privacy {

  /** Equivalence classes below k: the re-identification report.
    * One row per risky quasi-identifier combination with its class
    * size (1 = unique — the worst case).
    */
  def kAnonymityReport(
      df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier required")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < k)
  }

  /** The admission gate: keep only rows whose quasi-identifier class
    * has at least k members. Suppression, not generalization —
    * surviving rows are byte-identical to their inputs.
    */
  def suppressRare(
      df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier required")
    require(k >= 2, s"k must be >= 2, got $k")
    val safe = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= lit(k))
      .select(quasiCols.map(col): _*)
    df.join(safe, quasiCols, "left_semi")
  }
}
