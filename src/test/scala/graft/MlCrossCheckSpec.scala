package graft

import graft.queries.MlSuffStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-checks of the sufficient-statistics queries against (a) plain-Scala
  * recomputation from collected fixtures and (b) MLlib estimators — the
  * SURVEY §5.2 "ML cross-check" layer. sf0.001 keeps collects tiny (500
  * embeddings / 6000 lineitems). */
class MlCrossCheckSpec extends AnyFunSuite {
  import SparkFixture._

  /** Solve Ax=b (3×3) by Gaussian elimination with partial pivoting. */
  private def solve3(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val a = a0.map(_.clone()); val b = b0.clone(); val n = 3
    for (k <- 0 until n) {
      val p = (k until n).maxBy(i => math.abs(a(i)(k)))
      val (ta, tb) = (a(k), b(k)); a(k) = a(p); a(p) = ta; b(k) = b(p); b(p) = tb
      for (i <- k + 1 until n) {
        val f = a(i)(k) / a(k)(k)
        for (j <- k until n) a(i)(j) -= f * a(k)(j)
        b(i) -= f * b(k)
      }
    }
    val x = new Array[Double](n)
    for (i <- n - 1 to 0 by -1) {
      x(i) = (b(i) - (i + 1 until n).map(j => a(i)(j) * x(j)).sum) / a(i)(i)
    }
    x
  }

  private lazy val emb: Array[(Int, Array[Double])] =
    Tables.embeddings(spark, Sf0001)
      .select(col("label"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))

  test("q_ml_linreg_normal sums solve to MLlib normal-equation coefficients") {
    val r = SparkEntry.queries("q_ml_linreg_normal")(spark, Sf0001).collect()(0)
    val Seq(n, sq, sd, sqq, sqd, sdd, sy, sqy, sdy) =
      (0 to 8).map(i => if (i == 0) r.getLong(0).toDouble else r.getDouble(i))
    val beta = solve3(
      Array(Array(n, sq, sd), Array(sq, sqq, sqd), Array(sd, sqd, sdd)),
      Array(sy, sqy, sdy))
    val m = graft.ml.Pipelines.linregNormal(
      Tables.lineitem(spark, Sf0001), "l_extendedprice", Seq("l_quantity", "l_discount"))
    val exp = Array(m.intercept, m.coefficients(0), m.coefficients(1))
    beta.zip(exp).zipWithIndex.foreach { case ((g, e), i) =>
      assert(math.abs(g - e) / math.max(1.0, math.abs(e)) < 1e-3,
        s"beta($i): sums→$g mllib→$e")
    }
  }

  test("q_ml_wls sums solve to MLlib weighted-regression coefficients") {
    val r = SparkEntry.queries("q_ml_wls")(spark, Sf0001).collect()(0)
    val Seq(sw, swq, swd, swqq, swqd, swdd, swy, swqy, swdy) =
      (1 to 9).map(r.getDouble)
    val beta = solve3(
      Array(Array(sw, swq, swd), Array(swq, swqq, swqd), Array(swd, swqd, swdd)),
      Array(swy, swqy, swdy))
    val df = Tables.lineitem(spark, Sf0001)
      .withColumn("w", lit(1.0) / (lit(1.0) + col("l_quantity")))
    val m = graft.ml.Pipelines.linregWeighted(
      df, "l_extendedprice", Seq("l_quantity", "l_discount"), "w")
    val exp = Array(m.intercept, m.coefficients(0), m.coefficients(1))
    beta.zip(exp).zipWithIndex.foreach { case ((g, e), i) =>
      assert(math.abs(g - e) / math.max(1.0, math.abs(e)) < 1e-3,
        s"wls beta($i): sums→$g mllib→$e")
    }
  }

  test("q_ml_nb_train matches plain-Scala per-class moments and MLlib theta") {
    val rows = SparkEntry.queries("q_ml_nb_train")(spark, Sf0001).collect()
    val byLabel = emb.groupBy(_._1)
    rows.foreach { r =>
      val lab = r.getInt(0); val n = r.getLong(1)
      val xs = byLabel(lab).map(_._2)
      assert(n == xs.length)
      for (d <- 0 to 3) {
        val vals = xs.map(_(d))
        val mean = vals.sum / n
        val varS = vals.map(v => (v - mean) * (v - mean)).sum / (n - 1)
        assert(math.abs(r.getDouble(2 + d) - mean) < 2e-6, s"label $lab m$d")
        assert(math.abs(r.getDouble(6 + d) - varS) < 2e-6, s"label $lab v$d")
      }
    }
    // MLlib Gaussian NB theta = per-class feature means on the same data.
    val nb = graft.ml.Pipelines.gaussianNb(
      Tables.embeddings(spark, Sf0001), "label", "embedding")
    rows.foreach { r =>
      val lab = r.getInt(0)
      for (d <- 0 to 3)
        assert(math.abs(nb.theta(lab, d) - r.getDouble(2 + d)) < 1e-4,
          s"theta($lab,$d) ${nb.theta(lab, d)} vs ${r.getDouble(2 + d)}")
    }
  }

  test("q_ml_kmeans_step does not increase within-cluster SSQ (Lloyd)") {
    val init = MlSuffStats.kmeansCentroids.map { case (x, y) => Array(x, y) }
    val pts = emb.map(_._2.take(2))
    def wss(cs: Seq[Array[Double]]): Double =
      pts.map(p => cs.map(c =>
        (p(0) - c(0)) * (p(0) - c(0)) + (p(1) - c(1)) * (p(1) - c(1))).min).sum
    val stepped = SparkEntry.queries("q_ml_kmeans_step")(spark, Sf0001).collect()
      .map(r => Array(r.getDouble(2), r.getDouble(3))).toSeq
    assert(stepped.size == 4)
    assert(wss(stepped) <= wss(init) + 1e-9,
      s"WSS rose: ${wss(init)} -> ${wss(stepped)}")
    // MLlib's full iterative loop from the same k: runs and yields k centers.
    val km = graft.ml.Pipelines.kmeans(Tables.embeddings(spark, Sf0001), "embedding", 4)
    assert(km.clusterCenters.length == 4)
  }

  test("q_ml_gda_stats pools to the plain-Scala pooled covariance") {
    val rows = SparkEntry.queries("q_ml_gda_stats")(spark, Sf0001).collect()
    val n = rows.map(_.getLong(1)).sum.toDouble
    // columns: label, n, m0, m1, s00, s01, s11
    val pooled00 = rows.map(r => r.getLong(1) * r.getDouble(4)).sum / n
    val pooled01 = rows.map(r => r.getLong(1) * r.getDouble(5)).sum / n
    val pooled11 = rows.map(r => r.getLong(1) * r.getDouble(6)).sum / n
    // Direct: per-class-centered covariance over all points.
    val byLabel = emb.groupBy(_._1)
    val means = byLabel.map { case (l, xs) =>
      l -> Array(xs.map(_._2(0)).sum / xs.size, xs.map(_._2(1)).sum / xs.size)
    }
    var (c00, c01, c11) = (0.0, 0.0, 0.0)
    emb.foreach { case (l, v) =>
      val d0 = v(0) - means(l)(0); val d1 = v(1) - means(l)(1)
      c00 += d0 * d0; c01 += d0 * d1; c11 += d1 * d1
    }
    assert(math.abs(pooled00 - c00 / n) < 1e-5)
    assert(math.abs(pooled01 - c01 / n) < 1e-5)
    assert(math.abs(pooled11 - c11 / n) < 1e-5)
    // Pooled 2×2 must be positive definite for GDA to be usable.
    assert(pooled00 > 0 && pooled00 * pooled11 - pooled01 * pooled01 > 0)
  }

  test("q_ml_logreg_step gradient == Iterative.logisticGradientStep (sign-flipped)") {
    import org.apache.spark.sql.functions._
    // The declared key computes the DESCENT gradient Σ(p−y)xⱼ with no
    // intercept term; Iterative computes the ASCENT gradient Σ(y−p)xⱼ with
    // an intercept slot. Same sigmoid, same fixed weights — the two must be
    // negatives of each other, and the losses equal.
    val e = Tables.embeddings(spark, Sf0001)
      .select((col("label") % 2).cast("double").as("y"),
        col("embedding")(0).cast("double").as("x0"),
        col("embedding")(1).cast("double").as("x1"),
        col("embedding")(2).cast("double").as("x2"),
        col("embedding")(3).cast("double").as("x3"))
    val (grad, nll) = graft.ml.Iterative.logisticGradientStep(
      e, "y", Seq("x0", "x1", "x2", "x3"),
      Array(0.0, 0.1, -0.2, 0.05, 0.15))
    val r = SparkEntry.queries("q_ml_logreg_step")(spark, Sf0001).collect()(0)
    for (j <- 0 until 4)
      assert(math.abs(r.getDouble(1 + j) + grad(j + 1)) < 1e-4,
        s"g$j ${r.getDouble(1 + j)} vs ascent ${grad(j + 1)}")
    assert(math.abs(r.getDouble(5) - nll) < 1e-4, s"loss ${r.getDouble(5)} vs $nll")
  }

  test("q_ml_pca_power: top-3 components match MLlib PCA; eigenpairs self-consistent") {
    val out = SparkEntry.queries("q_ml_pca_power")(spark, Sf0001)
      .orderBy("component", "dim_idx").collect()
    assert(out.length == 3 * 64)
    val comps = (1 to 3).map { c =>
      val rows = out.filter(_.getInt(0) == c)
      (rows.map(_.getDouble(2)), rows.head.getDouble(3), rows.head.getDouble(4))
    }
    // MLlib computePrincipalComponents is the same covariance eigenproblem
    // solved exactly (Breeze eigh) — every deflated iterate must align
    // with its column (pc.toArray is column-major: 64 entries per PC).
    val withVec = graft.ml.Pipelines.withFeatures(
      Tables.embeddings(spark, Sf0001), "embedding")
    val pcAll = new org.apache.spark.ml.feature.PCA()
      .setK(3).setInputCol("features").setOutputCol("pc")
      .fit(withVec).pc.toArray
    for (c <- 0 until 3) {
      val (v, eig, ratio) = comps(c)
      assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-3,
        s"component ${c + 1} loadings not unit-norm")
      val pc = pcAll.slice(c * 64, (c + 1) * 64)
      val cos = math.abs(v.zip(pc).map { case (a, b) => a * b }.sum) /
        math.sqrt(pc.map(x => x * x).sum)
      assert(cos > 0.999, s"|cos| vs MLlib component ${c + 1} = $cos")
      assert(eig > 0.0 && ratio > 0.0 && ratio < 1.0)
      // Sign convention per component: largest-|loading| coordinate > 0.
      val am = v.indices.maxBy(i => (math.abs(v(i)), -i))
      assert(v(am) > 0.0, s"sign convention violated: comp ${c + 1} dim $am")
    }
    // Spectral order and deflation hygiene: eigenvalues strictly
    // descending, components pairwise orthogonal.
    assert(comps(0)._2 > comps(1)._2 && comps(1)._2 > comps(2)._2,
      s"eigenvalues not descending: ${comps.map(_._2)}")
    for (a <- 0 until 3; b <- a + 1 until 3) {
      val dot = math.abs(comps(a)._1.zip(comps(b)._1)
        .map { case (x, y) => x * y }.sum)
      assert(dot < 1e-3, s"components ${a + 1},${b + 1} not orthogonal: $dot")
    }
  }

  test("q_ml_pipeline: fitted Pipeline agrees with the sufficient-stats GD weights; optimum beats the fixed-step loss; confusion counts consistent") {
    import org.apache.spark.ml.classification.LogisticRegressionModel
    import org.apache.spark.ml.feature.StandardScalerModel
    val base = Tables.embeddings(spark, Sf0001).select(
      (col("label") % 2).cast("double").as("y") +:
      (0 until 4).map(i => col("embedding")(i).cast("double").as(s"x$i")): _*)
    val model = graft.ml.Pipelines.fittedLogregPipeline(
      base, "y", (0 until 4).map(i => s"x$i"))
    val scaler = model.stages(1).asInstanceOf[StandardScalerModel]
    val lr = model.stages(2).asInstanceOf[LogisticRegressionModel]
    // Scaled-space coefficients map back raw via w_i / sigma_i (the scaler's
    // mean shift lands in the intercept). The same convex objective fit RAW
    // (no assembler/scaler stages) converges to the same optimum, so the
    // mapped-back direction must agree — this pins the pipeline's stage
    // plumbing, not optimizer luck. (The 4-step GD iterate of
    // q_ml_logreg_converged is still near its arbitrary init and is NOT a
    // direction reference; it anchors the loss bound below instead.)
    val wPipe = (0 until 4).map(i => lr.coefficients(i) / scaler.std(i))
    val rawFit = graft.ml.Pipelines.logistic(base, "y", (0 until 4).map(i => s"x$i"))
    val wRaw = (0 until 4).map(i => rawFit.coefficients(i))
    val cos = wPipe.zip(wRaw).map { case (a, b) => a * b }.sum /
      (math.sqrt(wPipe.map(x => x * x).sum) * math.sqrt(wRaw.map(x => x * x).sum))
    info(s"raw-space direction cosine vs unscaled MLlib fit: $cos")
    assert(cos > 0.999,
      s"pipeline coefficients diverge from the raw-space optimum: $cos " +
        s"(pipe=$wPipe raw=$wRaw)")
    val gd = SparkEntry.queries("q_ml_logreg_converged")(spark, Sf0001).collect()(0)
    // The convex optimum's mean NLL must be <= the 4-step GD iterate's
    // (objectiveHistory at regParam 0 IS the mean NLL; the GD key reports
    // the dsum'd NLL total and n).
    val gdMeanNll = gd.getDouble(9) / gd.getLong(0).toDouble
    val pipeMeanNll = lr.summary.objectiveHistory.last
    info(s"mean NLL: pipeline=$pipeMeanNll gd=$gdMeanNll")
    assert(pipeMeanNll <= gdMeanNll + 1e-9,
      s"optimizer worse than 4 GD steps: $pipeMeanNll vs $gdMeanNll")
    // The graded key's confusion counts == this model's own replay.
    val key = SparkEntry.queries("q_ml_pipeline")(spark, Sf0001)
      .collect().map(_.toSeq).toSet
    val replay = model.transform(base)
      .groupBy(col("y").cast("long").as("truth"),
        col("prediction").cast("long").as("pred"))
      .agg(count(lit(1)).as("n"))
      .collect().map(_.toSeq).toSet
    assert(key == replay, s"graded counts diverge from the model replay")
    assert(key.map(_(2).asInstanceOf[Long]).sum ==
      Tables.embeddings(spark, Sf0001).count(), "confusion counts must cover the corpus")
  }

  test("q_ml_als_step: per-user closed-form solve matches a driver-side brute-force normal-equation solve") {
    // Brute force: collect (user, partkey, quantity), rebuild the fixed
    // item factors and solve each user's ridge system from RAW doubles
    // (no decimal rounding) — the graded solve-from-rounded-sums must
    // agree to well within the rounding's effect.
    val ratings = Tables.lineitem(spark, Sf0001)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      .join(Tables.orders(spark, Sf0001)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey"), col("l_quantity"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byUser = ratings.groupBy(_._1)
    val brute = byUser.map { case (u, rows) =>
      var (s11, s12, s22, b1, b2) = (0.0, 0.0, 0.0, 0.0, 0.0)
      for ((_, p, r) <- rows) {
        val f1 = ((p % 101) - 50).toDouble / 100.0
        val f2 = ((p % 89) - 44).toDouble / 100.0
        s11 += f1 * f1; s12 += f1 * f2; s22 += f2 * f2
        b1 += f1 * r; b2 += f2 * r
      }
      val lam = 0.1 * rows.length
      val det = (s11 + lam) * (s22 + lam) - s12 * s12
      u -> (((s22 + lam) * b1 - s12 * b2) / det,
        ((s11 + lam) * b2 - s12 * b1) / det, rows.length.toLong)
    }
    val got = SparkEntry.queries("q_ml_als_step")(spark, Sf0001).collect()
    assert(got.length == byUser.size, "one output row per rated user")
    for (r <- got) {
      val (u, n) = (r.getLong(0), r.getLong(1))
      val (w1, w2) = (r.getDouble(5), r.getDouble(6))
      val (e1, e2, en) = brute(u)
      assert(n == en, s"user $u: n $n != $en")
      assert(math.abs(w1 - e1) < 1e-3 && math.abs(w2 - e2) < 1e-3,
        s"user $u: ($w1, $w2) vs brute ($e1, $e2)")
    }
  }

  test("q_ml_isotonic PAV fit matches MLlib IsotonicRegression on the same bins") {
    val got = SparkEntry.queries("q_ml_isotonic")(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    // Monotone non-decreasing...
    for (w <- got.sliding(2) if w.length == 2)
      assert(w(0)._4 <= w(1)._4, s"fit not monotone at bins ${w(0)._1}/${w(1)._1}")
    // ...and mass-preserving: within each CONTIGUOUS run of one fitted
    // rate the rate IS the run's exact pooled positive rate. (A PAV block
    // is such a run; two distinct blocks can only share a rounded rate if
    // pooling order made them adjacent-equal, which contiguity captures.)
    val runs = got.foldLeft(List.empty[List[(Long, Long, Long, Double)]]) {
      case (acc, r) if acc.nonEmpty && acc.head.head._4 == r._4 =>
        (r :: acc.head) :: acc.tail
      case (acc, r) => List(r) :: acc
    }
    for (blk <- runs) {
      val (n, pos) = (blk.map(_._2).sum, blk.map(_._3).sum)
      val exact = BigDecimal(pos) * 1000000 / BigDecimal(n)
      assert(blk.head._4 ==
        exact.setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong / 1e6,
        s"rate ${blk.head._4} not the pooled mass of its run ($pos/$n)")
    }
    // MLlib twin: weighted isotonic regression on (bin, pos_rate, n).
    import spark.implicits._
    val pts = got.toSeq.map { case (bin, n, pos, _) =>
      (pos.toDouble / n, bin.toDouble, n.toDouble) }
      .toDF("label", "features", "weight")
    val mllib = new org.apache.spark.ml.regression.IsotonicRegression()
      .setFeaturesCol("features").setWeightCol("weight").setIsotonic(true)
      .fit(pts)
    val preds = mllib.transform(pts).select(col("features"), col("prediction"))
      .collect().map(r => r.getDouble(0).toLong -> r.getDouble(1)).toMap
    for ((bin, _, _, rate) <- got) {
      val p = preds(bin)
      assert(math.abs(rate - p) < 1e-6,
        s"bin $bin: iso_rate $rate vs MLlib $p")
    }
  }
}
