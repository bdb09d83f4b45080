package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Custom Catalyst expression for the one hot-path Spark's built-ins can't
  * express efficiently (SURVEY.md §7.3 tier (b)): the float-vector dot
  * product.
  *
  * The higher-order-function formulation
  * (`aggregate(sequence(0,63), …)`) is CodegenFallback — every element
  * step is an interpreted lambda call with boxing. This expression is a
  * tight codegen'd loop over the two `ArrayData`s, accumulating in double
  * with the same left-to-right order as the fold (and as the DuckDB
  * oracle), so results stay bit-identical while the inner loop becomes
  * branch-free Java.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"float_dot requires two array<float> arguments, got $l and $r")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // Null also arises from malformed input (length mismatch, null element),
  // not just null children.
  override def nullable: Boolean = true
  override def prettyName: String = "float_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // Match the fold/oracle semantics on malformed rows: a length
    // mismatch or a null element yields NULL, never a partial sum.
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  private[functions] val fid = FunctionIdentifier("float_dot")
  private[functions] val info =
    new ExpressionInfo(classOf[FloatVectorDot].getName, "float_dot")
  private[functions] val builder = (exprs: Seq[Expression]) => {
    require(exprs.length == 2, "float_dot takes exactly 2 arguments")
    FloatVectorDot(exprs.head, exprs(1)): Expression
  }

  /** Idempotently register `float_dot` in this session's function registry
    * so `expr("float_dot(a, b)")` resolves. Called lazily at query-build
    * time — works for any session, extensions-configured or not.
    */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(fid)) {
      spark.sessionState.functionRegistry.registerFunction(fid, info, builder)
    }
}

/** `SparkSessionExtensions` hook: sessions built with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) get `float_dot` from the start
  * — the deployment path for a shared cluster where per-session lazy
  * registration is not wanted.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      VectorFunctions.fid, VectorFunctions.info, VectorFunctions.builder))
}
