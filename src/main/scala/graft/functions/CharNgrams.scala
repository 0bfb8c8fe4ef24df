package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character n-gram kernel: ALL n-grams of a string in one linear pass.
  *
  * Replaces `transform(sequence(1, len-n+1), i -> substring(s, i, n))`,
  * which is quadratic PER ROW two ways: the HOF dispatches an interpreted
  * lambda per position, and `substring(s, i, n)` on a UTF8String re-scans
  * from byte 0 to find the i-th codepoint (UTF-8 is variable-width), so the
  * row costs O(len²) byte work. This kernel walks the byte array once,
  * records every codepoint's byte offset, and slices each gram directly —
  * O(len + grams·n) — while producing BIT-IDENTICAL values to the
  * substring formulation (asserted in TextOpsSpec), including its edge
  * rule: strings shorter than n (even empty) yield one truncated gram,
  * mirroring `sequence(1, greatest(len-n+1, 1))`.
  */
object CharNgramsKernel {

  def ngrams(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    // Byte offset of each codepoint, plus the terminal offset.
    val nb = bytes.length
    var chars = 0
    var i = 0
    val offs = new Array[Int](nb + 1)
    while (i < nb) {
      offs(chars) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      chars += 1
    }
    offs(chars) = nb
    val count = math.max(chars - n + 1, 1)
    val out = new Array[AnyRef](count)
    var g = 0
    while (g < count) {
      val end = math.min(g + n, chars)
      out(g) = UTF8String.fromBytes(bytes, offs(g), offs(end) - offs(g))
      g += 1
    }
    new GenericArrayData(out)
  }
}

/** `char_ngrams(string) -> array<string>` with a compile-time gram width —
  * same custom-Expression surface as SimHash64 / MinHashSig (codegen'd, so
  * the whole tokenize→explode pipeline stays inside WholeStageCodegen). */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "gram width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "char_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngrams requires string input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    CharNgramsKernel.ngrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharNgramsKernel.ngrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNgrams {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}
  import org.apache.spark.sql.types.IntegerType

  /** `char_ngrams(s, n)` for SQL users — gram width must be a FOLDABLE int
    * literal (a compile-time parameter of the generated code). */
  private val builder: Seq[Expression] => Expression = {
    case Seq(s, Literal(n: Int, IntegerType)) => CharNgrams(s, n)
    case exprs => throw new org.apache.spark.sql.AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map(
        "functionName" -> "`char_ngrams`",
        "expectedNum" -> "2 (string, INT literal)",
        "actualNum" -> exprs.length.toString, "docroot" -> "-"))
  }
  val info = new ExpressionInfo(classOf[CharNgrams].getName, "char_ngrams")

  /** Register on a session's registry (idempotent); called from Tables.prep
    * alongside the other native kernels. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier("char_ngrams"), info, builder)
}
