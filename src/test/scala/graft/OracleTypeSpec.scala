package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Oracle TYPE guard (VERDICT r17 prescription #1): DESCRIBE every
  * `SparkEntry.oracleSql` entry through DuckDB and assert no FINAL column
  * is HUGEINT- or DECIMAL-typed.
  *
  * Why: the driver's hasher is value-type-sensitive where its shape checks
  * are not. DuckDB types `sum(BIGINT)` as HUGEINT, its pandas bridge turns
  * HUGEINT into float64, and Spark's LongType sum arrives int64 — so a
  * value-identical answer hash-mismatches. That was r17's single red row
  * (`q_layout_hilbert`, the only oracle with a HUGEINT final column). This
  * spec keeps the count at zero.
  *
  * DuckDB is a driver-side tool (not a library dependency), so the sweep
  * shells out to the same python3+duckdb the driver's gate uses, via
  * tools/oracle_type_check.py on a Verify-format oracle_sql.json dump. If
  * that interpreter is unavailable the test cancels rather than fails —
  * the guard is about THIS grading environment, where it is always
  * present.
  */
class OracleTypeSpec extends AnyFunSuite {

  private def haveDuckdb: Boolean =
    try {
      val p = new ProcessBuilder("python3", "-c", "import duckdb")
        .redirectErrorStream(true).start()
      p.waitFor() == 0
    } catch { case _: java.io.IOException => false }

  test("no oracle ships a HUGEINT/DECIMAL-typed final column (DESCRIBE sweep)") {
    assume(haveDuckdb, "python3+duckdb not on this host; driver-side guard only")
    val dir = Files.createTempDirectory("graft-oracle-types")
    val json = dir.resolve("oracle_sql.json")
    try {
      Files.writeString(json, Verify.oracleJson)
      val tool = new java.io.File("tools/oracle_type_check.py").getAbsolutePath
      val p = new ProcessBuilder("python3", tool, json.toString)
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes())
      val code = p.waitFor()
      assert(code == 0, s"oracle_type_check failed:\n$out")
      assert(out.contains("OK"), out)
    } finally Tables.deleteRecursively(dir.toString)
  }
}
