package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table helpers: pre-shuffle a fact table ONCE at write time so
  * every later equi-join/aggregation on the bucket key is exchange-free.
  * At 100 TB this converts the recurring dominant shuffle of a hot join
  * key (e.g. lineitem⋈orders on orderkey) into a one-time layout cost —
  * the classic warehouse trade. Requires a catalog table (`saveAsTable`);
  * plain parquet paths cannot carry bucket metadata.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "writeBucketed needs at least one bucket column")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, cols.head, cols.tail: _*)
      .sortBy(cols.head, cols.tail: _*)
      .saveAsTable(table)
  }
}
