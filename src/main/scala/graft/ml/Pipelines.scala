package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel, NaiveBayes, NaiveBayesModel}
import org.apache.spark.ml.clustering.{GaussianMixture, GaussianMixtureModel, KMeans, KMeansModel}
import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, BucketedRandomProjectionLSHModel, MinHashLSH, MinHashLSHModel, StandardScaler, VectorAssembler}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.regression.{LinearRegression, LinearRegressionModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib estimator wrappers — the "full pipeline" counterpart of the
  * sufficient-statistics queries in queries/MlSuffStats.scala (SURVEY.md
  * §2.1's right-hand column): where the reference iterates MapReduce jobs
  * from a Python driver, Spark's estimators iterate over a cached DataFrame
  * inside one JVM/cluster app. These wrappers are exercised by the
  * MlCrossCheckSpec tests, which assert the closed-form query results agree
  * with the estimators' fits.
  *
  * All stochastic components take fixed seeds so fits are reproducible.
  */
object Pipelines {

  /** array<float|double> column → MLlib `features` vector column. */
  def withFeatures(df: DataFrame, arrayCol: String): DataFrame =
    df.withColumn("features", array_to_vector(col(arrayCol).cast("array<double>")))

  /** Assemble named scalar columns into `features`. */
  def withFeatureCols(df: DataFrame, cols: Seq[String]): DataFrame =
    df.withColumn("features", array_to_vector(array(cols.map(c => col(c).cast("double")): _*)))

  /** Normal-equation linear regression (the reference's P1 algorithm run as
    * a one-shot distributed solve). */
  def linregNormal(df: DataFrame, labelCol: String, featureCols: Seq[String]): LinearRegressionModel =
    new LinearRegression()
      .setSolver("normal").setRegParam(0.0).setElasticNetParam(0.0)
      .setLabelCol(labelCol).setFeaturesCol("features")
      .fit(withFeatureCols(df, featureCols))

  /** Weighted least squares (REF-P1's weighted/locally-weighted variant;
    * cross-check target for q_ml_wls' sufficient statistics). */
  def linregWeighted(df: DataFrame, labelCol: String, featureCols: Seq[String],
                     weightCol: String): LinearRegressionModel =
    new LinearRegression()
      .setSolver("normal").setRegParam(0.0).setElasticNetParam(0.0)
      .setWeightCol(weightCol)
      .setLabelCol(labelCol).setFeaturesCol("features")
      .fit(withFeatureCols(df, featureCols))

  /** Gaussian Naive Bayes (reference P1; MLlib modelType "gaussian"). */
  def gaussianNb(df: DataFrame, labelCol: String, arrayCol: String): NaiveBayesModel =
    new NaiveBayes().setModelType("gaussian")
      .setLabelCol(labelCol).setFeaturesCol("features")
      .fit(withFeatures(df.withColumn(labelCol, col(labelCol).cast("double")), arrayCol))

  /** Batch logistic regression (reference P2's gradient loop as an MLlib
    * estimator; ml/Iterative.scala holds the decomposed per-step form). */
  def logistic(df: DataFrame, labelCol: String, featureCols: Seq[String]): LogisticRegressionModel =
    new LogisticRegression().setRegParam(0.0).setStandardization(false)
      .setLabelCol(labelCol).setFeaturesCol("features")
      .fit(withFeatureCols(df.withColumn(labelCol, col(labelCol).cast("double")), featureCols))

  /** Gaussian mixture via EM (reference P2; seeded). */
  def gmm(df: DataFrame, arrayCol: String, k: Int, seed: Long = 42L): GaussianMixtureModel =
    new GaussianMixture().setK(k).setSeed(seed).setFeaturesCol("features")
      .fit(withFeatures(df, arrayCol))

  /** K-means (reference P2's full iterative loop, seeded). */
  def kmeans(df: DataFrame, arrayCol: String, k: Int, seed: Long = 42L): KMeansModel =
    new KMeans().setK(k).setSeed(seed).setFeaturesCol("features")
      .fit(withFeatures(df, arrayCol))

  /** K-means tuned as a COARSE QUANTIZER (IVF cells), not a clustering
    * deliverable: capped iterations and the feature frame cached across
    * them (each MLlib init/iteration pass otherwise re-reads and re-decodes
    * the source parquet). `trainSample` < 1 fits the quantizer on a seeded
    * sample — the standard IVF build at 100 TB, where the quantizer trains
    * on ~10⁵ vectors and only the ASSIGNMENT pass touches the full table. */
  def kmeansQuantizer(df: DataFrame, arrayCol: String, k: Int, seed: Long = 42L,
                      maxIter: Int = 10, trainSample: Double = 1.0): KMeansModel = {
    val base = if (trainSample < 1.0) df.sample(trainSample, seed) else df
    // Every k-means init pass + iteration is a separate job over this
    // frame; size its partitioning to the DATA, not the session default —
    // a tiny training set spread over 32 partitions pays ~15 jobs of
    // per-task scheduling overhead for no parallelism (the dominant cost
    // of the IVF build at small SF). ~32 MiB per fit task.
    val spark = df.sparkSession
    val parts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism,
      (graft.operators.ScaleOps.estimatedBytes(base) / (32L << 20)).toInt))
    val feats = withFeatures(base, arrayCol).select("features")
      .repartition(parts).persist()
    try {
      new KMeans().setK(k).setSeed(seed)
        .setMaxIter(maxIter).setFeaturesCol("features")
        .fit(feats)
    } finally feats.unpersist(blocking = false)
  }

  /** END-TO-END fitted `ml.Pipeline` — the north star's named approach
    * ("MLlib pipeline") as ONE multi-stage artifact rather than a bare
    * estimator: VectorAssembler (named scalar columns → vector) →
    * StandardScaler (mean-centered, unit-variance — the preprocessing the
    * bare wrappers above skip) → LogisticRegression, fit as a single
    * PipelineModel whose transform() replays all three stages. All
    * components are deterministic given the data (assembler/scaler are
    * closed-form; L-BFGS at regParam 0 converges to the convex optimum),
    * but the treeAggregate float-sum order makes fits
    * partitioning-sensitive in the last ulps — which is why the graded key
    * surfaces transform-level statistics and the spec cross-checks against
    * the sufficient-statistics weights rather than hash-matching an
    * oracle. Standardization is done by the EXPLICIT scaler stage, so the
    * estimator's own implicit standardization is off — the fitted
    * coefficients live in scaled space and map back raw via wᵢ/σᵢ. */
  def fittedLogregPipeline(df: DataFrame, labelCol: String,
                           featureCols: Seq[String]): PipelineModel =
    new Pipeline().setStages(Array(
      new VectorAssembler()
        .setInputCols(featureCols.toArray).setOutputCol("assembled"),
      new StandardScaler()
        .setInputCol("assembled").setOutputCol("features")
        .setWithMean(true).setWithStd(true),
      new LogisticRegression()
        .setLabelCol(labelCol).setFeaturesCol("features")
        .setRegParam(0.0).setStandardization(false)
        .setMaxIter(100).setTol(1e-9)))
      .fit(df)

  /** Random-projection LSH for Euclidean ANN (the 100 TB similarity path). */
  def brpLsh(dfWithFeatures: DataFrame, bucketLength: Double, numTables: Int,
             seed: Long = 42L): BucketedRandomProjectionLSHModel =
    new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength).setNumHashTables(numTables).setSeed(seed)
      .setInputCol("features").setOutputCol("hashes")
      .fit(dfWithFeatures)

  /** MLlib MinHash LSH over a sparse set vector — kept alongside the custom
    * banded implementation in LlmOps for cross-checking in tests. */
  def minhashLsh(dfWithFeatures: DataFrame, numTables: Int, seed: Long = 42L): MinHashLSHModel =
    new MinHashLSH().setNumHashTables(numTables).setSeed(seed)
      .setInputCol("features").setOutputCol("hashes")
      .fit(dfWithFeatures)
}
