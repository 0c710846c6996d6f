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

  /** Write `df` as a bucketed, per-bucket-sorted catalog table.
    *
    * Overwrite-safe even when the managed LOCATION survives without its
    * catalog entry (a crashed previous run, or a fresh session over an old
    * warehouse dir): `SaveMode.Overwrite` refuses to claim an orphaned
    * location, so any stale table AND directory are removed first.
    */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "writeBucketed needs at least one bucket column")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, cols.head, cols.tail: _*)
      .sortBy(cols.head, cols.tail: _*)
      .saveAsTable(table)
  }
}
