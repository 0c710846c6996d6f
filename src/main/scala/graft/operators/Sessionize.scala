package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: assign every event a per-key `session_idx`
  * (1-based) that increments whenever the gap to the previous event
  * exceeds the threshold. One shuffle on the key; both windows (lag and
  * running sum) share the same partitioning and sort, so Catalyst plans a
  * single exchange + sort.
  */
object Sessionize {

  /** @param gap SQL interval literal body, e.g. "30 minutes". */
  def byGap(df: DataFrame, keys: Seq[String], tsCol: String, gap: String): DataFrame = {
    require(keys.nonEmpty, "sessionization needs at least one key column")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    val prev = lag(col(tsCol), 1).over(w)
    val newSession = when(prev.isNull || col(tsCol) > prev + expr(s"INTERVAL $gap"), 1).otherwise(0)
    df.withColumn("__graft_ns", newSession)
      .withColumn(
        "session_idx",
        sum(col("__graft_ns")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__graft_ns")
  }
}
