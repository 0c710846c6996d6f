package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression.
  *
  * Mixed-source crawl text stores the same glyph as composed (é) or
  * decomposed (e + U+0301) codepoints; every downstream exact-dedup hash,
  * shingle, and token count treats those as different documents unless
  * text is normalized first — so NFC belongs at the very front of the
  * text pipeline, before [[graft.pipeline.TextOps]] fingerprinting.
  * Spark has no built-in for it; a Scala UDF would break whole-stage
  * codegen right at the hottest map stage, so this generates a direct
  * `java.text.Normalizer` call (`doGenCode`) with an `isNormalized`
  * fast path — ASCII and already-composed text (the overwhelming
  * majority of a real corpus) skips allocation entirely.
  *
  * Semantics match DuckDB's `nfc_normalize` (both implement Unicode
  * UAX #15 NFC), which is what the t18 oracle checks.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = GraftFunctions.NfcNormalizeName

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by interpreted eval and generated code (JIT inlines it). */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Single-space token count as a native expression: exactly
  * `size(split(text, " "))` under the engine's tokenizer contract
  * (split with limit -1 keeps empty tokens, so the count is always
  * spaces + 1, empty string included) — WITHOUT materializing the token
  * array. `split` allocates an `Array[UTF8String]` per row just to take
  * its length; every stats/packing/budget operator counts tokens, so at
  * corpus scale that array is pure GC pressure. This scans the
  * UTF8String's bytes for 0x20 (UTF-8 continuation bytes are >= 0x80,
  * so a raw byte scan cannot miscount inside multi-byte codepoints) and
  * stays in whole-stage codegen via `doGenCode`.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = GraftFunctions.TokenCountName

  override protected def nullSafeEval(input: Any): Any =
    TokenCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenCount {
  /** Shared by interpreted eval and generated code (JIT inlines it). */
  def count(s: UTF8String): Int = {
    val n = s.numBytes
    var i = 0
    var c = 1
    while (i < n) {
      if (s.getByte(i) == 0x20) c += 1
      i += 1
    }
    c
  }
}
