package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** SimHash kernel: ONE compiled pass over the token array — each token is
  * xxhash64'd once and votes ±1 on all 64 bit tallies; bits with positive
  * tallies are set in the packed 64-bit fingerprint.
  *
  * Replaces the interpreted `aggregate(transform(sequence(0,63), ...))` HOF
  * fold (text/TextOps round-3 formulation), which re-folded the whole token
  * array once PER BIT — 64 × tokens lambda dispatches and 64 interpreted
  * re-hashes of every token. Values are bit-identical to that fold: same
  * xxhash64 (seed 42), same ±1 voting, same strict `tally > 0` bit rule
  * (a zero tally — e.g. the empty token array — leaves the bit clear).
  */
object SimHash {

  /** Spark's default hash seed, matching SQL `xxhash64(tok)`. */
  private val Seed = 42L

  /** One pass over a string token array; called from both the interpreted
    * eval and the generated code (static forwarder). Null elements vote with
    * the bits of the seed itself — exactly what the SQL fold did, because
    * `xxhash64(NULL)` leaves the running hash at its seed. */
  def hash64(arr: ArrayData): Long = {
    val tally = new Array[Int](64)
    val m = arr.numElements()
    var j = 0
    while (j < m) {
      val h =
        if (arr.isNullAt(j)) Seed
        else XXH64.hashUTF8String(arr.getUTF8String(j), Seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (tally(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** `simhash64(array<string>) -> bigint` — the whole SimHash fingerprint as
  * one codegen'd expression (same custom-Expression surface as VecDot /
  * MinHashSig). Null array → null; null ELEMENTS vote as the seed's bits
  * (mirroring `xxhash64(NULL)` in the HOF fold this kernel replaces). */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string> input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash.hash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.hash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  private val builder: Seq[Expression] => Expression = { exprs =>
    if (exprs.length != 1) {
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> "`simhash64`", "expectedNum" -> "1",
          "actualNum" -> exprs.length.toString, "docroot" -> "-"))
    }
    SimHash64(exprs.head)
  }

  val info = new ExpressionInfo(classOf[SimHash64].getName, "simhash64")

  /** Register on a session's registry (idempotent); called from Tables.prep
    * alongside vec_dot / minhash_sig, and lazily from TextOps.simhash64 for
    * library callers outside the Tables loaders. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier("simhash64"), info, builder)
}
