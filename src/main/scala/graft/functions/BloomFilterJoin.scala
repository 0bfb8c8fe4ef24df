package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(key, serialized_filter)` — codegen'd membership
  * probe against a pre-built Bloom filter, the kernel of the semi-join
  * reduction in [[graft.operators.BloomJoin]].
  *
  * The second argument is a FOLDABLE binary literal holding the filter's
  * serialized form ([[BloomFilter.writeTo]]); it is deserialized ONCE per
  * expression instance (transient lazy) on the driver at codegen time and
  * shipped to executors through the codegen reference array — the per-row
  * cost is the probe's two xxhash-derived index lookups, inside
  * whole-stage codegen. This mirrors the shape of Spark's own
  * runtime-row-level-filtering expression, built here on the PUBLIC sketch
  * API so the operator can gate, size, and place the filter explicitly.
  *
  * Null semantics: null key → null (such a row can't equi-join anyway, and
  * a `Filter` drops nulls, matching the inner-join result). False
  * POSITIVES pass the probe and are eliminated by the real join that
  * always follows; false negatives are impossible — so the reduction is
  * semantically invisible.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  // Always nullable: a null key OR a null serialized-filter literal yields
  // null (the latter is registry-reachable SQL — bloom_might_contain(k,
  // CAST(NULL AS BINARY)) must not NPE at codegen).
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == BinaryType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bloom_might_contain requires (bigint, foldable binary), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql}, foldable=${right.foldable})")

  // The foldable right is evaluated once per expression instance on the
  // driver; a NULL literal is legal and short-circuits both eval paths to
  // null (BinaryExpression.eval already returns null before nullSafeEval
  // when the right child is null, so only codegen needs the guard).
  @transient private lazy val filterBytes: Array[Byte] =
    right.eval(null).asInstanceOf[Array[Byte]]

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def nullSafeEval(key: Any, ignored: Any): Any =
    bloom.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (filterBytes == null) {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      return ev.copy(code = code"""
        boolean ${ev.isNull} = true;
        boolean ${ev.value} = false;""")
    }
    val bf = ctx.addReferenceObj("bloomFilter", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (key, _) => s"${ev.value} = $bf.mightContainLong($key);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {

  val builder: Seq[Expression] => Expression = { exprs =>
    if (exprs.length != 2) {
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> "`bloom_might_contain`", "expectedNum" -> "2",
          "actualNum" -> exprs.length.toString, "docroot" -> "-"))
    }
    BloomMightContain(exprs(0), exprs(1))
  }

  val info = new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain")

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("bloom_might_contain"), info, builder)
}
