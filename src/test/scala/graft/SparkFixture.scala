package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test run (Spark startup is
  * ~5 s; per-suite sessions would dominate test time). Config mirrors the
  * driver's Verify/Bench builders plus Tables.prep's runtime confs. */
object SparkFixture {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val Sf0001 = "/root/testdata/sf0.001"
  val Sf001 = "/root/testdata/sf0.01"
}
