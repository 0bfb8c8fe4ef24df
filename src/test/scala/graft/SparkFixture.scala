package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test run (Spark startup is
  * ~5 s; per-suite sessions would dominate test time). Config mirrors the
  * driver's Verify/Bench builders plus Tables.prep's runtime confs. */
object SparkFixture {
  lazy val spark: SparkSession = {
    // Per-JVM staging root, deleted on JVM exit — test runs leave no
    // graft-stage residue in java.io.tmpdir (same lifecycle Verify/Bench own
    // for their runs).
    val stageRoot = java.nio.file.Files
      .createTempDirectory("graft-test-stage").toString
    sys.addShutdownHook(Tables.deleteRecursively(stageRoot))
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("graft.stage.dir", stageRoot)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val Sf0001 = "/root/testdata/sf0.001"
  val Sf001 = "/root/testdata/sf0.01"
}
