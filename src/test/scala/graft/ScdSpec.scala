package graft

import graft.operators.Scd
import org.scalatest.funsuite.AnyFunSuite

/** operators/Scd.buildType2 semantics: interval chaining, delete closure,
  * close-reopen, and the one-open-version-per-live-key invariant. */
class ScdSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  import spark.implicits._

  // Arrival order deliberately scrambled — intervals must come from seq.
  // Key 1: versioned twice, deleted, then re-inserted (close-reopen).
  // Key 2: single open version. Key 3: created then deleted (dead key).
  private def log = Seq(
    (1L, 7, "U", 14.0),
    (1L, 0, "U", 10.0),
    (3L, 1, "D", 0.0),
    (1L, 5, "D", 0.0),
    (2L, 0, "U", 20.0),
    (1L, 2, "U", 12.0),
    (3L, 0, "U", 30.0)
  ).toDF("k", "seq", "op", "v")

  private def versions =
    Scd.buildType2(log, "k", "seq", "op")
      .select("k", "valid_from", "valid_to", "is_current", "v")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2), r.getBoolean(3), r.getDouble(4)))
      .toSet

  test("intervals chain through updates, deletes close, reopen re-opens") {
    assert(versions == Set(
      (1L, 0, 2, false, 10.0),
      (1L, 2, 5, false, 12.0), // closed by the DELETE's seq, not a U
      (1L, 7, -1, true, 14.0), // re-opened after the delete
      (2L, 0, -1, true, 20.0),
      (3L, 0, 1, false, 30.0) // dead key: no open version survives
    ))
  }

  test("at most one current version per key; dead keys have none") {
    val current = versions.filter(_._4)
    assert(current.map(_._1).size == current.size)
    assert(!current.exists(_._1 == 3L))
  }

  test("D rows never surface as version rows") {
    assert(versions.size == 5) // five U rows → five versions; both D rows closed intervals only
  }
}
