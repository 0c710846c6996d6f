package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** JPEG dimensions from the SOF marker, as a native Catalyst expression.
  *
  * PNG/GIF/WAV header fields sit at FIXED offsets, so
  * [[graft.pipeline.Multimodal.parseContainerMeta]] reads them with pure
  * `substring`/`conv` arithmetic. JPEG is the one mainstream container
  * whose dimensions live at a VARIABLE offset: the frame header (SOFn
  * marker) follows an arbitrary prefix of metadata segments (APPn/EXIF,
  * COM, DQT, …), each self-describing via a big-endian u16 length. The
  * walk over those segments is still pure byte arithmetic — no decoder,
  * no entropy decode, it stops at SOS before any image data — but it is
  * a loop, so it lives here as a codegen'd expression rather than a
  * Column tree: header-metadata triage over 100 TB of crawl JPEGs stays
  * map-only and inside whole-stage codegen (the [[TokenCount]] argument;
  * a UDF would break codegen exactly on the ingest hot path).
  *
  * Returns `(width << 32) | height` as a nullable LONG — NULL for
  * anything that is not a well-formed JPEG header prefix (no SOI, a
  * segment overrunning the payload, SOS/EOI before any SOF). All SOF
  * flavors carry dimensions at the same offsets (baseline C0, progressive
  * C2, lossless C3, the arithmetic-coded C9–CB/CD–CF family); C4/C8/CC
  * are DHT/JPG/DAC, not frame headers, and are skipped like any other
  * segment — the published ITU T.81 marker layout.
  */
case class JpegSofDims(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = GraftFunctions.JpegSofDimsName

  override protected def nullSafeEval(input: Any): Any = {
    val v = JpegSofDims.compute(input.asInstanceOf[Array[Byte]])
    if (v == -1L) null else java.lang.Long.valueOf(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.JpegSofDims.compute($c);
         |if (${ev.value} == -1L) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JpegSofDims {
  /** Shared by interpreted eval and generated code (JIT inlines it).
    * Returns -1 when no parsable SOF exists (mapped to NULL above —
    * dimensions in [1, 65535] make the packed value always >= 0, so the
    * sentinel cannot collide with a real answer).
    */
  def compute(bytes: Array[Byte]): Long = {
    val len = bytes.length
    // SOI (FF D8) or it isn't a JPEG stream at all.
    if (len < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return -1L
    var pos = 2
    while (pos + 1 < len) {
      if ((bytes(pos) & 0xff) != 0xff) return -1L // lost sync: not a marker
      // Fill bytes: any number of FFs may pad before the marker id.
      while (pos + 1 < len && (bytes(pos + 1) & 0xff) == 0xff) pos += 1
      if (pos + 1 >= len) return -1L
      val marker = bytes(pos + 1) & 0xff
      pos += 2
      if (marker == 0xd8 || marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        // Standalone markers (SOI/TEM/RSTn): no length segment.
      } else if (marker == 0xd9 || marker == 0xda) {
        // EOI, or SOS with no SOF seen: a frame header cannot follow
        // entropy-coded data in a well-formed stream — dims unknown.
        return -1L
      } else {
        if (pos + 1 >= len) return -1L
        val segLen = ((bytes(pos) & 0xff) << 8) | (bytes(pos + 1) & 0xff)
        if (segLen < 2 || pos + segLen > len) return -1L
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          // [len u16][precision u8][height u16][width u16]...
          if (segLen < 7) return -1L
          val h = ((bytes(pos + 3) & 0xff) << 8) | (bytes(pos + 4) & 0xff)
          val w = ((bytes(pos + 5) & 0xff) << 8) | (bytes(pos + 6) & 0xff)
          if (w == 0 || h == 0) return -1L
          return (w.toLong << 32) | h.toLong
        }
        pos += segLen
      }
    }
    -1L
  }
}
