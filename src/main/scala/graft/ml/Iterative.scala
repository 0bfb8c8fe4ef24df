package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's P2 pattern — iterative broadcast-parameter refinement —
  * in its Spark-native form: where the reference re-submits a MapReduce job
  * per iteration with the current weights shipped as a file, here each
  * iteration is ONE aggregation pass over a cached DataFrame with the
  * weights folded in as literals, and the driver loop never leaves the JVM.
  *
  * Per-iteration shape (the optimal distributed form): map-side partial
  * aggregation of the d+1 gradient components ≡ the reference's in-mapper
  * combining; the shuffle carries one (d+1)-vector per partition.
  *
  * Production path for the full algorithm is MLlib
  * (`ml.classification.LogisticRegression` — Pipelines.logistic); this
  * module demonstrates the decomposition and feeds the cross-check tests.
  */
object Iterative {

  /** One batch-gradient pass for L2-free logistic regression on label y ∈
    * {0,1} and features xCols (with implicit intercept): returns
    * (gradient, negative log-likelihood). Weights ride into the plan as
    * literals — the Spark equivalent of the reference's broadcast weight
    * file. */
  def logisticGradientStep(df: DataFrame, yCol: String, xCols: Seq[String],
                           w: Array[Double]): (Array[Double], Double) = {
    require(w.length == xCols.length + 1)
    val z = xCols.zipWithIndex
      .map { case (c, i) => col(c).cast("double") * lit(w(i + 1)) }
      .foldLeft(lit(w(0)).cast("double"))(_ + _)
    val p = lit(1.0) / (lit(1.0) + exp(-z))
    val err = col(yCol).cast("double") - p
    val aggs =
      sum(err).as("g0") +:
      xCols.zipWithIndex.map { case (c, i) => sum(err * col(c).cast("double")).as(s"g${i + 1}") } :+
      sum(-col(yCol).cast("double") * log(p) - (lit(1.0) - col(yCol).cast("double")) * log(lit(1.0) - p)).as("nll")
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    ((0 to xCols.length).map(i => r.getDouble(i)).toArray, r.getDouble(xCols.length + 1))
  }

  /** Driver loop: gradient ascent on the log-likelihood. `df` should be
    * cached by the caller — the reference pays a full job submission per
    * iteration; Spark pays one action over cached partitions. */
  def logisticTrain(df: DataFrame, yCol: String, xCols: Seq[String],
                    iters: Int, lr: Double): (Array[Double], Seq[Double]) = {
    var w = new Array[Double](xCols.length + 1)
    val losses = Seq.newBuilder[Double]
    for (_ <- 1 to iters) {
      val (g, nll) = logisticGradientStep(df, yCol, xCols, w)
      losses += nll
      w = w.zip(g).map { case (wi, gi) => wi + lr * gi }
    }
    (w, losses.result())
  }

  /** One EM step of a 1-D two-component Gaussian mixture (the reference's
    * GMM-by-EM decomposed): E-step responsibilities as expressions, M-step
    * as weighted aggregates — a single pass. Returns updated
    * (weight1, mu0, mu1, var0, var1). */
  def gmmEmStep(df: DataFrame, xCol: String,
                w1: Double, mu0: Double, mu1: Double,
                var0: Double, var1: Double): (Double, Double, Double, Double, Double) = {
    val x = col(xCol).cast("double")
    def gauss(mu: Double, v: Double) =
      exp((x - mu) * (x - mu) * lit(-0.5 / v)) * lit(1.0 / math.sqrt(2 * math.Pi * v))
    val p0 = gauss(mu0, var0) * lit(1.0 - w1)
    val p1 = gauss(mu1, var1) * lit(w1)
    val r1 = p1 / (p0 + p1) // responsibility of component 1
    val r = df.agg(
      count(lit(1)).cast("double").as("n"),
      sum(r1).as("n1"),
      sum(r1 * x).as("s1"),
      sum((lit(1.0) - r1) * x).as("s0"),
      sum(r1 * x * x).as("q1"),
      sum((lit(1.0) - r1) * x * x).as("q0")).collect()(0)
    val (n, n1) = (r.getDouble(0), r.getDouble(1))
    val n0 = n - n1
    val m0 = r.getDouble(3) / n0; val m1 = r.getDouble(2) / n1
    val v0 = r.getDouble(5) / n0 - m0 * m0
    val v1 = r.getDouble(4) / n1 - m1 * m1
    (n1 / n, m0, m1, math.max(v0, 1e-9), math.max(v1, 1e-9))
  }

  /** Observed-data log-likelihood of the 1-D two-component mixture —
    * the EM monotonicity witness used in tests. */
  def gmmLogLik(df: DataFrame, xCol: String,
                w1: Double, mu0: Double, mu1: Double,
                var0: Double, var1: Double): Double = {
    val x = col(xCol).cast("double")
    def gauss(mu: Double, v: Double) =
      exp((x - mu) * (x - mu) * lit(-0.5 / v)) * lit(1.0 / math.sqrt(2 * math.Pi * v))
    df.agg(sum(log(gauss(mu0, var0) * lit(1.0 - w1) + gauss(mu1, var1) * lit(w1))))
      .collect()(0).getDouble(0)
  }
}
