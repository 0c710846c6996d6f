package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.GraftSuite

/** Z-order layout specs: key arithmetic against hand-interleaved values,
  * and the operational claim — a z-ordered layout skips files for
  * selective predicates on EITHER dimension, where a single-column sort
  * only skips on its own column.
  */
class ZOrderSpec extends GraftSuite {
  import spark.implicits._

  test("zkey interleaves bits: hand-checked values, 2 and 3 columns") {
    val df = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (3L, 5L, 0L), (0L, 0L, 1L))
      .toDF("x", "y", "z")
    val two = df.select(ZOrder.zkey(Seq(col("x"), col("y")), 4).as("k"))
      .as[Long].collect().toSeq
    // x=3 (011), y=5 (101): positions x->0,2,4.. y->1,3,5..
    // x bits 0,1 -> pos 0,2; y bits 0,2 -> pos 1,5 => 1+4+2+32 = 39
    assert(two === Seq(0L, 1L, 2L, 39L, 0L))
    val three = df.select(ZOrder.zkey(Seq(col("x"), col("y"), col("z")), 4).as("k"))
      .as[Long].collect().toSeq
    // n=3: bit i of col j at i*3+j; z=1 -> pos 2 => 4
    assert(three(4) === 4L)
    // x=3,y=5,z=0: x bits 0,1 -> pos 0,3 (1+8); y bits 0,2 -> pos 1,7 (2+128)
    assert(three(3) === 139L)
  }

  test("negative and over-width values are masked, never sign-polluted") {
    val df = Seq((-1L, 0L), (1L << 40, 0L)).toDF("x", "y")
    val ks = df.select(ZOrder.zkey(Seq(col("x"), col("y")), 4).as("k"))
      .as[Long].collect().toSeq
    // -1 masked to 0b1111 -> even positions 0,2,4,6 = 85; 2^40 masked to 0
    assert(ks === Seq(85L, 0L))
  }

  test("z-ordered layout skips files on BOTH dims; single-column sort only on its own") {
    // 64x64 dense grid: every (x, y) combination once.
    val grid = spark.range(64L * 64L)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val zdir = Files.createTempDirectory("zorder").toString + "/z"
    val xdir = Files.createTempDirectory("zorder").toString + "/x"
    ZOrder.writeZOrdered(grid, zdir, Seq("x", "y"), bits = 6, numFiles = 16)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(xdir)

    val zFiles = ZOrder.fileStats(spark.read.parquet(zdir), Seq("x", "y")).collect()
    val xFiles = ZOrder.fileStats(spark.read.parquet(xdir), Seq("x", "y")).collect()
    assert(zFiles.length === 16 && xFiles.length === 16)

    def touching(files: Array[org.apache.spark.sql.Row], minCol: String) =
      files.count(_.getAs[Long](minCol) < 8)

    // Predicate x < 8 (1/8 of the domain): both layouts skip.
    assert(touching(zFiles, "min_x") < 16)
    assert(touching(xFiles, "min_x") <= 2)
    // Predicate y < 8: z-order still skips; the x-sorted layout cannot —
    // every file spans the full y range.
    assert(touching(zFiles, "min_y") < 16,
      s"z-order should skip on y; touched ${touching(zFiles, "min_y")}/16")
    assert(touching(xFiles, "min_y") === 16)
  }
}
