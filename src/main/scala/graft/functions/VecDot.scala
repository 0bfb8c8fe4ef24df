package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over `array<float|double>` columns — the
  * custom-`Expression` surface of SURVEY.md §2.8.
  *
  * Replaces the three-HOF formulation (`aggregate(zip_with(...))`) in the
  * vector-math hot path: one fused loop inside whole-stage codegen instead
  * of three interpreted folds with per-element lambda dispatch and
  * intermediate arrays. The accumulation order (sequential, one independent
  * accumulator) is IDENTICAL to the HOF fold and to DuckDB's
  * `list_dot_product`, so swapping it in changes no oracle-checked value.
  *
  * Null semantics: null array → null; mismatched lengths → null (defensive;
  * never occurs for the fixed-dim embedding data). Elements are assumed
  * non-null (embedding vectors), matching the HOF version, which would
  * yield null on a null element anyway.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<float|double> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val xf = elemType(left) == FloatType
    val yf = elemType(right) == FloatType
    var dot = 0.0
    var i = 0
    while (i < n) {
      val xe = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val ye = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xe * ye
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      def get(arr: String, dt: DataType): String = dt match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case _ => s"$arr.getDouble($i)"
      }
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ${get(a, elemType(left))} * ${get(b, elemType(right))};
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecDot {

  /** Arity-checked function builder — shared by the runtime registration
    * below and GraftExtensions (a bare `exprs(0)/exprs(1)` would silently
    * drop extra arguments and crash unhelpfully on too few). */
  val builder: Seq[Expression] => Expression = { exprs =>
    if (exprs.length != 2) {
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> "`vec_dot`", "expectedNum" -> "2",
          "actualNum" -> exprs.length.toString, "docroot" -> "-"))
    }
    VecDot(exprs(0), exprs(1))
  }

  val info = new ExpressionInfo(classOf[VecDot].getName, "vec_dot")

  /** Register `vec_dot` on a session's function registry (idempotent) so
    * `expr("vec_dot(a, b)")` resolves — called from Tables.prep, which every
    * query's loader goes through. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("vec_dot"), info, builder)
}
