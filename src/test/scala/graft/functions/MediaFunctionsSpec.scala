package graft.functions

import org.apache.spark.sql.functions._

import graft.GraftSuite

class MediaFunctionsSpec extends GraftSuite {
  import spark.implicits._

  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("jpeg sof dims: SQL-registered, codegen == interpreted, packs w<<32|h, null-safe") {
    val rows = Seq(
      (1L, jpegBytes(17, 31)),
      (2L, jpegBytes(65535 min 200, 1)),
      (3L, Array[Byte](1, 2, 3)), // not a JPEG
      (4L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "payload")
    def sweep() = rows
      .selectExpr("id", "graft_jpeg_sof_dims(payload) AS wh")
      .select(col("id"), expr("wh >> 32").as("w"), expr("wh & 4294967295").as("h"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2))))).toSeq
    val withCodegen = sweep()
    assert(withCodegen === Seq(
      (1L, Some((17L, 31L))), (2L, Some((200L, 1L))), (3L, None), (4L, None)))
    // Codegen and interpreted agree (the GramRollingHash convention).
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(sweep() === withCodegen)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    // Type guard: a non-binary argument is rejected at analysis.
    val err = intercept[Exception] {
      Seq("x").toDF("s").selectExpr("graft_jpeg_sof_dims(s)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("binary"), err.getMessage)
  }
}
