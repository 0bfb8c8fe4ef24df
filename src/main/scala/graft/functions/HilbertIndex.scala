package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd 32-bit Hilbert index of two 16-bit non-negative ints
  * — the custom-`Expression` tier for Layout.hilbert16's hot path.
  *
  * Why an Expression and not column functions: the xy2d recurrence is
  * SEQUENTIAL across the 16 bit levels, so a declarative formulation is
  * either an exponentially-duplicated expression tree (unrolled) or an
  * interpreted higher-order `aggregate` fold — measured ~45 µs/row, 36 s
  * over sf0.1's lineitem, vs ~1.5 s for the z-order twin whose bit spread
  * codegens. This expression emits the classic 16-iteration xy2d loop
  * (reflect-both + swap on (rx=1, ry=0), swap on (rx=0, ry=0), digit
  * (3·rx)^ry accumulating base-4) as straight-line generated Java inside
  * whole-stage codegen — the same loop LayoutSkewSpec's driver reference
  * runs, pinned bit-for-bit there.
  *
  * Inputs are LongType (callers cast); values outside [0, 65535] are
  * masked to their low 16 bits (the scaled inputs never exceed it). */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "hilbert_idx"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_idx requires (bigint, bigint), got " +
      s"${left.dataType.sql}, ${right.dataType.sql}")

  /** The xy2d loop — shared verbatim by the interpreted eval and (as
    * generated Java) the codegen path. */
  private[graft] def xy2d(x0: Long, y0: Long): Long = {
    var x = x0 & 0xFFFFL
    var y = y0 & 0xFFFFL
    var d = 0L
    var s = 32768L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = 65535L - x; y = 65535L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $a & 0xFFFFL;
         |long $y = $b & 0xFFFFL;
         |long $d = 0L;
         |for (long $s = 32768L; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $x = 65535L - $x; $y = 65535L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {

  val builder: Seq[Expression] => Expression = { exprs =>
    if (exprs.length != 2) {
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> "`hilbert_idx`", "expectedNum" -> "2",
          "actualNum" -> exprs.length.toString, "docroot" -> "-"))
    }
    HilbertIndex(exprs(0), exprs(1))
  }

  val info = new ExpressionInfo(classOf[HilbertIndex].getName, "hilbert_idx")

  /** Register `hilbert_idx` on the session's function registry
    * (idempotent) — called from Tables.prep like the other native
    * expressions. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("hilbert_idx"), info, builder)
}
