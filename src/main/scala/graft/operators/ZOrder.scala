package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout clustering — multi-dimensional data skipping
  * for 100 TB scans. A single-column sort gives parquet min/max pruning on
  * that column and NOTHING on any other; interleaving the bits of several
  * filter columns into one sort key makes every written file cover a
  * small hyper-rectangle of the combined key space, so a selective
  * predicate on ANY of the z-columns skips most files. This is the layout
  * move behind Delta/Iceberg `OPTIMIZE ZORDER BY` — here as a plain
  * column expression plus a range-partitioned write, with no table-format
  * dependency.
  *
  * The key is a pure per-row expression (shifts/masks only — one
  * whole-stage-codegen span, no UDF); the write is one range exchange on
  * the key, the same shuffle a plain `orderBy` would pay. Columns are
  * taken modulo `2^bits`, so callers should map heavy-tailed domains onto
  * dense ints first (dictionary or bucket rank) — standard z-order
  * practice.
  */
object ZOrder {

  /** The Morton key: bit `i` of column `j` lands at position `i*n + j`.
    * Total key width `n*bits` must fit a signed long.
    */
  def zkey(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, "z-order needs at least two columns (one column = plain sort)")
    require(bits > 0 && n * bits <= 63, s"key width ${n * bits} must be in 1..63")
    val mask = (1L << bits) - 1
    cols.zipWithIndex.map { case (c, j) =>
      val m = c.cast("bigint").bitwiseAND(lit(mask))
      (0 until bits).map { i =>
        shiftleft(shiftright(m, i).bitwiseAND(lit(1L)), i * n + j)
      }.reduce(_ + _) // disjoint bit positions: + is |
    }.reduce(_ + _)
  }

  /** Write `df` z-ordered on `zcols` into `numFiles` range-partitioned
    * files (compose with [[Layout.partitionsFor]] to size them).
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      zcols: Seq[String],
      bits: Int = 16,
      numFiles: Int): Unit = {
    val keyed = df.withColumn("__graft_zkey", zkey(zcols.map(col), bits))
    keyed
      .repartitionByRange(numFiles, col("__graft_zkey"))
      .sortWithinPartitions("__graft_zkey")
      .drop("__graft_zkey")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Per-file min/max of `statCols` for a written layout — the same stats
    * a scan's file-skipping consults, as a frame (diagnostics / specs).
    */
  def fileStats(df: DataFrame, statCols: Seq[String]): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(
        count(lit(1)).as("rows"),
        statCols.flatMap(c => Seq(min(c).as(s"min_$c"), max(c).as(s"max_$c"))): _*)
}
