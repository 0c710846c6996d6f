package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two `array<double>` columns.
  *
  * Why a custom Catalyst expression instead of the `aggregate(zip_with(...))`
  * higher-order form: Spark evaluates HOF lambdas interpreted, outside
  * whole-stage codegen — measured several times slower on the embedding
  * fixtures. This expression generates a tight primitive loop straight over
  * `ArrayData` (`doGenCode`), so similarity search stays inside codegen with
  * zero boxing. Summation is sequential left-to-right, matching both the HOF
  * fold and DuckDB's `list_dot_product` for oracle bit-parity.
  *
  * Null elements inside the arrays are read as 0.0 (embeddings are dense;
  * the engine never produces null components).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val allArrays = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (allArrays) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = GraftFunctions.DotProductName

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session wiring for the graft native functions — the public
  * `SparkSessionExtensions` path:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.functions.GraftExtensions`). Registration
  * makes the functions available to both the Column API
  * (`functions.call_function`) and plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftFunctions.inject(ext)
}

object GraftFunctions {
  val DotProductName = "graft_dot_product"
  val NfcNormalizeName = "graft_nfc_normalize"
  val TokenCountName = "graft_token_count"
  val GramRollingHashName = "graft_gram_rolling_hash"
  val JpegSofDimsName = "graft_jpeg_sof_dims"

  /** Spark's OWN codegen'd bloom expressions (`BloomFilterAggregate`,
    * `BloomFilterMightContain` — the machinery behind runtime row-level
    * filtering) are internal-only: the registry exposes no SQL names for
    * them. These aliases surface them to the Column API / SQL so the
    * ingest prefilter ([[graft.pipeline.Dedup.bloomFreshDocs]]) composes
    * native expressions instead of reimplementing a sketch.
    */
  val BloomAggName = "graft_bloom_agg"
  val BloomMightContainName = "graft_bloom_might_contain"

  def inject(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(BloomAggName),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        BloomAggName),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          s"$BloomAggName expects (value, estimatedItems, numBits), got ${children.size} args")
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children.head, children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier(BloomMightContainName),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        BloomMightContainName),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"$BloomMightContainName expects (bloomFilter, value), got ${children.size} args")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier(GramRollingHashName),
      new ExpressionInfo(classOf[GramRollingHash].getName, GramRollingHashName),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          s"$GramRollingHashName expects (tokens, n, seed), got ${children.size} args")
        val Seq(_, nE, seedE) = children
        require(nE.foldable && seedE.foldable,
          s"$GramRollingHashName: n and seed must be literals")
        // A foldable NULL literal (CAST(NULL AS INT)) evals to null —
        // fail with the same clean message, not an opaque NPE (ADVICE
        // r13 #2).
        val (nV, seedV) = (nE.eval(), seedE.eval())
        require(nV != null && seedV != null,
          s"$GramRollingHashName: n and seed must be non-null literals")
        GramRollingHash(children.head,
          nV.asInstanceOf[Number].intValue(),
          seedV.asInstanceOf[Number].longValue())
      }))
    ext.injectFunction((
      FunctionIdentifier(TokenCountName),
      new ExpressionInfo(classOf[TokenCount].getName, TokenCountName),
      (children: Seq[Expression]) => {
        require(children.size == 1, s"$TokenCountName expects 1 argument, got ${children.size}")
        TokenCount(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier(DotProductName),
      new ExpressionInfo(classOf[DotProduct].getName, DotProductName),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"$DotProductName expects 2 arguments, got ${children.size}")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier(NfcNormalizeName),
      new ExpressionInfo(classOf[NfcNormalize].getName, NfcNormalizeName),
      (children: Seq[Expression]) => {
        require(children.size == 1, s"$NfcNormalizeName expects 1 argument, got ${children.size}")
        NfcNormalize(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier(JpegSofDimsName),
      new ExpressionInfo(classOf[JpegSofDims].getName, JpegSofDimsName),
      (children: Seq[Expression]) => {
        require(children.size == 1, s"$JpegSofDimsName expects 1 argument, got ${children.size}")
        JpegSofDims(children.head)
      }))
  }
}
