package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — without an equi key, Spark can only
  * plan this as a broadcast-nested-loop / cartesian product. Bin bucketing
  * restores an equi-join: intervals explode to the fixed-width bins they
  * cover, points compute their single bin, the join keys on the bin id,
  * and the exact containment predicate filters within the bin. Join
  * fan-out becomes intervals-per-bin rather than |points|·|intervals| —
  * the shape that survives 100 TB of points.
  *
  * Bounds are inclusive-start, exclusive-end: `start <= p < end`.
  * Degenerate intervals (`end <= start`) match nothing. Values must be
  * non-negative numerics (epoch micros and the like) below 2^53 so the
  * bin arithmetic stays exact in double space.
  *
  * @param binWidth bin size in the point column's units; pick it at or
  *                 above the typical interval length (each interval
  *                 explodes to ~length/binWidth + 1 rows).
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val w = lit(binWidth)
    val pBinned = points.withColumn("__graft_bin", floor(col(pointCol) / w).cast("long"))
    val iBinned = intervals
      .filter(col(endCol) > col(startCol)) // Spark's sequence() would run DESCENDING otherwise
      .withColumn(
        "__graft_bin",
        explode(sequence(
          floor(col(startCol) / w).cast("long"),
          floor((col(endCol) - 1) / w).cast("long"))))
    pBinned.join(iBinned, Seq("__graft_bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__graft_bin")
  }
}
