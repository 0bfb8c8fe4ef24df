package graft

import graft.functions.{Gram, Vec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom-surface checks (SURVEY §2.8): the native VecDot expression and the
  * Gram-matrix typed Aggregator. */
class VecGramSpec extends AnyFunSuite {
  import SparkFixture._

  test("native vec_dot is bit-identical to the HOF fold on real embeddings") {
    val e = Tables.embeddings(spark, Sf0001).limit(200)
      .select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val both = e.crossJoin(broadcast(q))
      .select(
        Vec.dot("embedding", "qe").as("native"),
        Vec.dotHof("embedding", "qe").as("hof"),
        Vec.dot("embedding", "embedding").as("n2_native"),
        expr("aggregate(transform(embedding, x -> double(x) * double(x)), 0D, (s, v) -> s + v)").as("n2_hof"))
      .collect()
    both.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), s"dot ${r.getDouble(0)} != ${r.getDouble(1)}")
      assert(r.getDouble(2) == r.getDouble(3), s"norm2 ${r.getDouble(2)} != ${r.getDouble(3)}")
    }
  }

  test("vec_dot: null on length mismatch, handles double arrays") {
    import spark.implicits._
    Tables.prep(spark)
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    assert(df.select(Vec.dot("a", "b")).collect()(0).getDouble(0) == 32.0)
    val bad = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
    assert(bad.select(Vec.dot("a", "b")).collect()(0).isNullAt(0))
  }

  test("vec_dot participates in whole-stage codegen") {
    val e = Tables.embeddings(spark, Sf0001)
    val plan = e.select(Vec.dot("embedding", "embedding").as("n2"))
      .queryExecution.executedPlan.toString
    // A leading `*(n)` marks an operator inside a WholeStageCodegen stage.
    assert(plan.linesIterator.exists(l => l.contains("vec_dot") && l.trim.startsWith("*(")),
      s"vec_dot Project not inside a codegen stage:\n$plan")
  }

  test("Gram aggregator reproduces q_ml_linreg_normal sums and MLlib solve") {
    val li = Tables.lineitem(spark, Sf0001)
      .select(
        array(lit(1.0), col("l_quantity"), col("l_discount")).as("x"),
        col("l_extendedprice").as("y"))
    val packed = li.agg(Gram.gram(3)(col("x"), col("y")).as("g"))
      .collect()(0).getSeq[Double](0).toArray
    val (xtx, xty, n) = Gram.unpack(3, packed)
    val r = SparkEntry.queries("q_ml_linreg_normal")(spark, Sf0001).collect()(0)
    // columns: n, s_q, s_d, s_qq, s_qd, s_dd, s_y, s_qy, s_dy
    def close(a: Double, b: Double, what: String): Unit =
      assert(math.abs(a - b) / math.max(1.0, math.abs(b)) < 1e-6, s"$what: $a vs $b")
    assert(n == r.getLong(0).toDouble)
    close(xtx(0)(1), r.getDouble(1), "s_q"); close(xtx(0)(2), r.getDouble(2), "s_d")
    close(xtx(1)(1), r.getDouble(3), "s_qq"); close(xtx(1)(2), r.getDouble(4), "s_qd")
    close(xtx(2)(2), r.getDouble(5), "s_dd")
    close(xty(0), r.getDouble(6), "s_y"); close(xty(1), r.getDouble(7), "s_qy")
    close(xty(2), r.getDouble(8), "s_dy")
  }

  test("weighted Gram solves to MLlib weighted regression coefficients") {
    import org.apache.spark.ml.regression.LinearRegression
    val li = Tables.lineitem(spark, Sf0001)
      .select(
        array(lit(1.0), col("l_quantity")).as("x"),
        col("l_extendedprice").as("y"),
        (col("l_discount") + lit(0.5)).as("w"))
    val packed = li.agg(Gram.gramWeighted(2)(col("x"), col("y"), col("w")).as("g"))
      .collect()(0).getSeq[Double](0).toArray
    val (xtx, xty, sw) = Gram.unpack(2, packed)
    assert(sw > 0)
    // 2x2 solve.
    val det = xtx(0)(0) * xtx(1)(1) - xtx(0)(1) * xtx(1)(0)
    val b0 = (xty(0) * xtx(1)(1) - xty(1) * xtx(0)(1)) / det
    val b1 = (xtx(0)(0) * xty(1) - xtx(1)(0) * xty(0)) / det
    val m = new LinearRegression().setSolver("normal").setRegParam(0.0)
      .setWeightCol("w").setLabelCol("y").setFeaturesCol("features")
      .fit(graft.ml.Pipelines.withFeatureCols(
        Tables.lineitem(spark, Sf0001).select(
          col("l_quantity"), col("l_extendedprice").as("y"),
          (col("l_discount") + lit(0.5)).as("w")), Seq("l_quantity")))
    assert(math.abs(b0 - m.intercept) / math.abs(m.intercept) < 1e-6,
      s"intercept $b0 vs ${m.intercept}")
    assert(math.abs(b1 - m.coefficients(0)) / math.abs(m.coefficients(0)) < 1e-6,
      s"slope $b1 vs ${m.coefficients(0)}")
  }

  test("Gram aggregator at d=64 in one pass over embeddings") {
    val e = Tables.embeddings(spark, Sf0001)
      .select(col("embedding").cast("array<double>").as("x"),
        col("label").cast("double").as("y"))
    val packed = e.agg(Gram.gram(64)(col("x"), col("y")).as("g"))
      .collect()(0).getSeq[Double](0).toArray
    val (xtx, _, n) = Gram.unpack(64, packed)
    assert(n == 500.0)
    // Diagonal = per-dim energy: positive, symmetric by construction.
    (0 until 64).foreach(i => assert(xtx(i)(i) > 0.0))
    // Spot-check XtX(0)(0) against a direct sum.
    val direct = e.agg(sum(col("x")(0) * col("x")(0))).collect()(0).getDouble(0)
    assert(math.abs(xtx(0)(0) - direct) < 1e-9)
  }
}
