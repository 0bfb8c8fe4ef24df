package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType, StringType}

/** MinHash signature kernel: each shingle is hashed ONCE (xxhash64) and the
  * remaining `NumHashes - 1` hash functions are derived multiply-shift
  * permutations `g_i(h) = A_i * h + B_i` with odd `A_i` — each `g_i` is a
  * bijection on Z/2^64, so `min_i` over a set is a legitimate permutation
  * MinHash. This replaces re-hashing every shingle's string bytes 64 times
  * (the round-2/3 formulation, ~24% of the whole benchmark) with one string
  * hash + 64 register mult-adds per shingle.
  *
  * Kept as plain JVM `long` arithmetic inside a native expression: Spark 4's
  * ANSI mode makes overflowing `*`/`+` on BIGINT columns an error, while
  * MinHash needs exactly the wrapping Z/2^64 semantics Java provides.
  */
object MinHash {

  /** Signature length: 64 hashes = 32 bands of 2 rows (LlmOps banding). */
  val NumHashes = 64

  private val Seed = 42L

  /** SplitMix64 finalizer — the standard public-domain seed-expansion mix
    * (Steele et al., "Fast Splittable Pseudorandom Number Generators"). */
  private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Odd multipliers (bijections) and offsets for the derived permutations. */
  private val A: Array[Long] = Array.tabulate(NumHashes)(i => splitmix64(2L * i + 1L) | 1L)
  private val B: Array[Long] = Array.tabulate(NumHashes)(i => splitmix64(-2L * i - 2L))

  /** One pass over a string shingle array; called from both the interpreted
    * eval and the generated code (static forwarder). Cost per shingle: one
    * xxhash64 of the string bytes + NumHashes mult-add/min steps. Null
    * elements are skipped (split() and many array builders declare
    * containsNull = true, so they are reachable from external callers). */
  def sig(arr: ArrayData): ArrayData = {
    val n = NumHashes
    val mins = new Array[Long](n)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val m = arr.numElements()
    var j = 0
    while (j < m) {
      if (!arr.isNullAt(j)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(j), Seed)
        var i = 0
        while (i < n) {
          val g = A(i) * h + B(i)
          if (g < mins(i)) mins(i) = g
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** Same over PRE-HASHED shingles (array<long>, e.g. `xxhash64(w1, w2)`
    * bigrams): the element is already a uniform 64-bit hash, so it feeds the
    * derived permutations directly — no string bytes touched at all. Null
    * elements are skipped, matching sig(). */
  def sigLong(arr: ArrayData): ArrayData = {
    val n = NumHashes
    val mins = new Array[Long](n)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val m = arr.numElements()
    var j = 0
    while (j < m) {
      if (!arr.isNullAt(j)) {
        val h = arr.getLong(j)
        var i = 0
        while (i < n) {
          val g = A(i) * h + B(i)
          if (g < mins(i)) mins(i) = g
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** Distinct word-bigram hashes of a token array in one compiled loop.
    * Values are bit-identical to SQL `xxhash64(w[i], w[i+1])` (seed 42,
    * seed-chained across the two words), so collision behavior matches the
    * prior HOF formulation exactly. Distinctness via sort + in-place dedup
    * (no boxing); element order is irrelevant downstream (min over
    * permutations / intersect size). */
  def bigrams(words: ArrayData): ArrayData = {
    val n = words.numElements()
    if (n < 2) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - 1)
    var k = 0
    var i = 0
    while (i < n - 1) {
      // Bigrams with a null word are skipped (split() declares
      // containsNull = true, so external callers can pass them).
      if (!words.isNullAt(i) && !words.isNullAt(i + 1)) {
        val h1 = XXH64.hashUTF8String(words.getUTF8String(i), Seed)
        out(k) = XXH64.hashUTF8String(words.getUTF8String(i + 1), h1)
        k += 1
      }
      i += 1
    }
    if (k == 0) return new GenericArrayData(Array.emptyLongArray)
    java.util.Arrays.sort(out, 0, k)
    var w = 1
    var r = 1
    while (r < k) {
      if (out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  /** Distinct word n-gram hashes of a token array in one compiled loop —
    * [[bigrams]] generalized to any gram width. Each word's bytes are
    * hashed ONCE (`xxhash64`, seed 42); a window's shingle hash chains the
    * member word hashes through xxhash64's long mixer, so the row costs
    * O(words · (bytes/word + n)) instead of the interpreted
    * `transform(sequence, i -> xxhash64(concat_ws(slice)))` chain, which
    * re-concatenated and re-hashed every window's bytes from scratch
    * (measured: ~2.8 s of q_dedup_ngram at sf0.1, the dominant stage).
    * Downstream consumers (Jaccard set math) only need hash identity per
    * distinct shingle string, not any particular hash function, so the
    * combiner choice is free. Null words void the windows containing them,
    * matching the skip rule of [[bigrams]]. */
  def ngrams(words: ArrayData, n: Int): ArrayData = ngrams(words, n, true)

  /** As [[ngrams]]; `distinct = false` keeps every window occurrence in
    * order (the shape repetition metrics need — they count duplicates). */
  def ngrams(words: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val m = words.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val wh = new Array[Long](m)
    val ok = new Array[Boolean](m)
    var i = 0
    while (i < m) {
      if (!words.isNullAt(i)) {
        ok(i) = true
        wh(i) = XXH64.hashUTF8String(words.getUTF8String(i), Seed)
      }
      i += 1
    }
    val out = new Array[Long](m - n + 1)
    var k = 0
    i = 0
    while (i <= m - n) {
      var good = true
      var j = 0
      while (j < n) { if (!ok(i + j)) good = false; j += 1 }
      if (good) {
        var h = wh(i)
        j = 1
        while (j < n) { h = XXH64.hashLong(wh(i + j), h); j += 1 }
        out(k) = h
        k += 1
      }
      i += 1
    }
    if (k == 0) return new GenericArrayData(Array.emptyLongArray)
    if (!distinct) return new GenericArrayData(java.util.Arrays.copyOf(out, k))
    java.util.Arrays.sort(out, 0, k)
    var w = 1
    var r = 1
    while (r < k) {
      if (out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  /** Count of equal slots between two equal-length signatures — the
    * estimated-Jaccard prefilter kernel. */
  def matches(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      // Null slots never match (signatures built here are null-free, but
      // external callers can hand in containsNull = true arrays).
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }
}

/** `minhash_sig(array<string> | array<long>) -> array<long>[64]` — the whole
  * MinHash signature as ONE codegen'd expression (same custom-Expression
  * surface as VecDot): no per-hash lambda dispatch, no intermediate arrays,
  * stays inside whole-stage codegen. String elements are xxhash64'd once
  * each; long elements are treated as ALREADY-uniform hashes and feed the
  * derived permutations directly. Null array → null; null ELEMENTS are
  * skipped (external callers can pass containsNull = true arrays). */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_sig"

  private def isString: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType | LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string> or array<long> input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    if (isString) MinHash.sig(input.asInstanceOf[ArrayData])
    else MinHash.sigLong(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isString) "sig" else "sigLong"
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash.$fn($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bigram_hashes(array<string>) -> array<long>` — distinct seed-chained
  * xxhash64 word-bigram shingles in one compiled loop (vs an interpreted
  * zip_with + array_distinct HOF chain with per-element boxing). */
case class BigramHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bigram_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bigram_hashes requires array<string> input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHash.bigrams(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash.bigrams($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `ngram_hashes(array<string>, n) -> array<long>` — distinct word n-gram
  * shingle hashes in one compiled loop, with a compile-time gram width
  * (same surface as CharNgrams; applied via ColumnBridge, no registry). */
case class NgramHashes(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {
  require(n >= 2, "gram width must be >= 2")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "ngram_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_hashes requires array<string> input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHash.ngrams(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash.ngrams($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `sig_matches(array<long>, array<long>) -> int` — equal-slot count between
  * two MinHash signatures (estimated Jaccard × 64), codegen'd. */
case class SigMatches(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "sig_matches"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sig_matches requires array<long> inputs, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    MinHash.matches(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.MinHash.matches($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MinHashSig {

  private def arity(name: String, n: Int)(
      mk: Seq[Expression] => Expression): Seq[Expression] => Expression = { exprs =>
    if (exprs.length != n) {
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`", "expectedNum" -> n.toString,
          "actualNum" -> exprs.length.toString, "docroot" -> "-"))
    }
    mk(exprs)
  }

  /** Arity-checked builders (mirror VecDot.builder). */
  val builder: Seq[Expression] => Expression =
    arity("minhash_sig", 1)(e => MinHashSig(e(0)))
  val bigramBuilder: Seq[Expression] => Expression =
    arity("bigram_hashes", 1)(e => BigramHashes(e(0)))
  val matchesBuilder: Seq[Expression] => Expression =
    arity("sig_matches", 2)(e => SigMatches(e(0), e(1)))

  val info = new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig")
  val bigramInfo = new ExpressionInfo(classOf[BigramHashes].getName, "bigram_hashes")
  val matchesInfo = new ExpressionInfo(classOf[SigMatches].getName, "sig_matches")

  /** `ngram_hashes(arr, n [, distinct])` for SQL users — gram width (and
    * the optional keep-all flag) must be FOLDABLE int/bool literals, since
    * they are compile-time parameters of the generated code. */
  val ngramBuilder: Seq[Expression] => Expression = { exprs =>
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BooleanType
    exprs match {
      case Seq(arr, Literal(n: Int, IntegerType)) => NgramHashes(arr, n)
      case Seq(arr, Literal(n: Int, IntegerType), Literal(d: Boolean, BooleanType)) =>
        NgramHashes(arr, n, d)
      case _ => throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> "`ngram_hashes`",
          "expectedNum" -> "2 (array, INT literal) or 3 (+ BOOLEAN literal)",
          "actualNum" -> exprs.length.toString, "docroot" -> "-"))
    }
  }
  val ngramInfo = new ExpressionInfo(classOf[NgramHashes].getName, "ngram_hashes")

  /** Register the MinHash function family on a session's registry
    * (idempotent); called from Tables.prep alongside vec_dot. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(FunctionIdentifier("minhash_sig"), info, builder)
    reg.registerFunction(FunctionIdentifier("bigram_hashes"), bigramInfo, bigramBuilder)
    reg.registerFunction(FunctionIdentifier("sig_matches"), matchesInfo, matchesBuilder)
    reg.registerFunction(FunctionIdentifier("ngram_hashes"), ngramInfo, ngramBuilder)
  }
}
