package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches over slices of a corpus — Spark's
  * native Apache DataSketches HLL expressions
  * (`hll_sketch_agg`/`hll_union_agg`/`hll_sketch_estimate`, codegen'd
  * aggregates, no UDFs) composed into the incremental-cardinality
  * pattern a 100 TB event lake actually runs: sketch each ingest slice
  * (day, source, snapshot) ONCE at write time, persist the few-KB
  * sketch rows beside the data, and answer "distinct users this
  * quarter / across sources" by unioning SKETCHES — history is never
  * rescanned, and slices compose in any grouping after the fact
  * (sketch union is associative and commutative, the property exact
  * distinct fundamentally lacks: exact per-day distincts cannot be
  * added across days).
  *
  * Approximation contract: a DataSketches HLL sketch is EXACT while it
  * remains in sparse (coupon) mode — up to roughly `0.75 · 2^lgConfigK`
  * distinct values per sketch — and a relative-error estimate
  * (~1.04/√2^lgConfigK) beyond; `lgConfigK` prices that trade
  * (default 14 ⇒ ~12k exact, ~0.8% error at scale). The fixture-scale
  * oracle relies on the exact regime; the spec pins estimate == exact
  * there and the error bound is the documented behavior past it.
  */
object Sketches {

  /** One HLL sketch per key group — the per-slice increment you persist.
    * Output `sketch` is the DataSketches binary; store it like any other
    * column (parquet `binary`).
    */
  def distinctSketches(
      df: DataFrame, keys: Seq[String], valueCol: String,
      lgConfigK: Int = 14): DataFrame = {
    require(keys.nonEmpty, "at least one grouping key required")
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgConfigK)).as("sketch"))
  }

  /** Union persisted sketches down to a distinct-count estimate per key
    * group — the read path: slices regroup freely (drop the slice key
    * from `keys` and days collapse into totals) without touching raw
    * history.
    */
  def unionEstimate(sketches: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one grouping key required")
    sketches.groupBy(keys.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(true)))
        .as("n_distinct"))
  }
}
