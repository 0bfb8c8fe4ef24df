package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Gram-matrix sufficient-statistics aggregate — the custom typed-UDAF
  * surface of SURVEY.md §2.8 (REF-P1): one pass over (x: vector, y: label)
  * accumulating every entry of XᵀX (packed upper triangle) and Xᵀy plus the
  * row count, i.e. exactly what the reference's linear-regression mappers
  * emit per split and its reducer sums. Backing for normal-equation solves
  * at dimensions where one sum-column per entry (q_ml_linreg_normal's
  * d=3 form) stops being writable — d=64 needs 2 144 accumulators.
  *
  * Scale shape: the buffer is a flat Array[Double] that merges map-side
  * (partial aggregation), so the shuffle carries one ~(d²/2 + 2d + 1)-double
  * row per partition — the optimal distributed form of the computation.
  */
class GramAggregator(d: Int)
    extends Aggregator[(Seq[Double], Double), Array[Double], Array[Double]] {

  private val tri = d * (d + 1) / 2
  /** Layout: [0, tri) packed upper-triangle XᵀX (row-major, j >= i);
    * [tri, tri + d) Xᵀy; [tri + d] n. */
  val size: Int = tri + d + 1

  override def zero: Array[Double] = new Array[Double](size)

  override def reduce(b: Array[Double], in: (Seq[Double], Double)): Array[Double] = {
    val (x, y) = in
    require(x.length == d, s"expected dim $d, got ${x.length}")
    var k = 0
    var i = 0
    while (i < d) {
      val xi = x(i)
      var j = i
      while (j < d) { b(k) += xi * x(j); k += 1; j += 1 }
      b(tri + i) += xi * y
      i += 1
    }
    b(tri + d) += 1.0
    b
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < size) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Double]): Array[Double] = r

  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}

/** Weighted variant — the reference's weighted/locally-weighted linear
  * regression (SURVEY §2.1 conf=M row): accumulates Σw·xᵢxⱼ, Σw·xᵢy, Σw. */
class WeightedGramAggregator(d: Int)
    extends Aggregator[(Seq[Double], Double, Double), Array[Double], Array[Double]] {

  private val inner = new GramAggregator(d)
  val size: Int = inner.size

  override def zero: Array[Double] = new Array[Double](size)

  override def reduce(b: Array[Double], in: (Seq[Double], Double, Double)): Array[Double] = {
    val (x, y, w) = in
    require(x.length == d, s"expected dim $d, got ${x.length}")
    val tri = d * (d + 1) / 2
    var k = 0
    var i = 0
    while (i < d) {
      val wxi = w * x(i)
      var j = i
      while (j < d) { b(k) += wxi * x(j); k += 1; j += 1 }
      b(tri + i) += wxi * y
      i += 1
    }
    b(tri + d) += w
    b
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = inner.merge(a, b)
  override def finish(r: Array[Double]): Array[Double] = r
  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}

object Gram {

  /** DataFrame-usable column aggregate: `gram(d)(xArrayCol, yCol)` →
    * packed Array[Double] per group. */
  def gram(d: Int): (Column, Column) => Column = {
    val fn = udaf(new GramAggregator(d), Encoders.tuple(
      ExpressionEncoder[Seq[Double]](), Encoders.scalaDouble))
    (x, y) => fn(x, y)
  }

  /** Weighted form: `gramWeighted(d)(x, y, w)`; the [tri+d] slot holds Σw. */
  def gramWeighted(d: Int): (Column, Column, Column) => Column = {
    val fn = udaf(new WeightedGramAggregator(d), Encoders.tuple(
      ExpressionEncoder[Seq[Double]](), Encoders.scalaDouble, Encoders.scalaDouble))
    (x, y, w) => fn(x, y, w)
  }

  /** Unpack a finished buffer into (XᵀX full matrix, Xᵀy, n). */
  def unpack(d: Int, b: Array[Double]): (Array[Array[Double]], Array[Double], Double) = {
    val tri = d * (d + 1) / 2
    val m = Array.ofDim[Double](d, d)
    var k = 0
    for (i <- 0 until d; j <- i until d) {
      m(i)(j) = b(k); m(j)(i) = b(k); k += 1
    }
    (m, b.slice(tri, tri + d), b(tri + d))
  }
}
