package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions injection path: a session built with
  * GraftExtensions resolves vec_dot without any runtime registration. */
class ExtensionsSpec extends AnyFunSuite {

  test("withExtensions(GraftExtensions) makes vec_dot resolvable at build time") {
    // Force the fixture session into existence first so its SparkContext is
    // reused, then build a SEPARATE session object with the extensions.
    val base = SparkFixture.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val withExt = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      try {
        val r = withExt.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
          .collect()(0).getDouble(0)
        assert(r == 11.0)
      } finally {
        // Session objects share the context; only clear the references.
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("rollup rewrite serves the aggregate from the rollup scan; guards hold") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.FileSourceScanExec
    val spark = SparkFixture.spark
    val dir = SparkFixture.Sf0001
    def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
      PlanCheck.flatten(PlanCheck.finalPlan(df)).collect {
        case s: FileSourceScanExec =>
          s.relation.location.rootPaths.map(_.toUri.getPath)
      }.flatten
    val q = () => Tables.customer(spark, dir)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        graft.functions.Det.dsum(col("c_acctbal")).as("acctbal_total"))
      .orderBy("c_mktsegment")
    try {
      // Baseline (no registration): served from the corpus.
      graft.plans.RollupRewrite.clear()
      graft.plans.RollupRewrite.attach(spark)
      val direct = q().collect().map(_.toSeq).toSeq
      assert(scanPaths(q()).exists(_.contains("customer.parquet")))
      // Registered: identical rows, rollup scanned, corpus NOT scanned.
      val rollup = graft.queries.Relational.stagedSegRollup(spark, dir)
      graft.plans.RollupRewrite.register(graft.plans.RollupSpec(
        s"$dir/customer.parquet", "c_mktsegment", "c_acctbal", rollup))
      val served = q()
      val paths = scanPaths(served)
      assert(paths.exists(_.contains("customer-seg-rollup")),
        s"rollup not scanned: $paths")
      assert(!paths.exists(_.contains("customer.parquet")),
        s"corpus still scanned: $paths")
      assert(served.collect().map(_.toSeq).toSeq == direct,
        "rewrite changed the result")
      // Guard: a Filter means the rollup does not cover the query.
      val filtered = Tables.customer(spark, dir)
        .filter(col("c_acctbal") > 0)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      assert(scanPaths(filtered).exists(_.contains("customer.parquet")),
        "filtered aggregate must NOT be rewritten")
      // Guard: an unregistered aggregate shape disables the rewrite.
      val otherAgg = Tables.customer(spark, dir)
        .groupBy(col("c_mktsegment"))
        .agg(max(col("c_acctbal")).as("mx"))
      assert(scanPaths(otherAgg).exists(_.contains("customer.parquet")),
        "max() aggregate must NOT be rewritten")
    } finally graft.plans.RollupRewrite.clear()
  }
}
