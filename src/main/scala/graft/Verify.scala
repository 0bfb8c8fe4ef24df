package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def jsonQuote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** The oracle map as the exact JSON the driver's `json.load` consumes —
    * shared by `main` and OracleTypeSpec's DESCRIBE-sweep guard. */
  def oracleJson: String = SparkEntry.oracleSql
    .map { case (k, v) => s"${jsonQuote(k)}: ${jsonQuote(v)}" }
    .mkString("{", ",", "}")

  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [queryName...] — trailing names select a
    // subset (dev tool, mirrors Bench's subset args); driver passes two.
    val Array(sfDir, outDir, rest @ _*) = args
    val wanted = rest.toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Staging (ORC round-trip, stream arrival dirs) lives under this run's
    // output root and dies with it — see Tables.stageDir.
    val stageRoot = Paths.get(outDir, "_stage").toString
    spark.conf.set("graft.stage.dir", stageRoot)
    SparkEntry.queries
      .filter { case (name, _) => wanted.isEmpty || wanted(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Query-internal persists (ScaleOps registry) die with the query —
      // without this, cached corpus derivatives accumulate across the run.
      graft.operators.ScaleOps.releaseTracked()
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), oracleJson)
    Tables.deleteRecursively(stageRoot)
    spark.stop()
  }
}
