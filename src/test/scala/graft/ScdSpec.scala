package graft

import graft.operators.Scd
import org.apache.spark.sql.functions._
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

  // ------------------------------------------ incremental refresh (epoch 2)

  // The fixture log split at the epoch boundary (every epoch-2 seq > every
  // epoch-1 seq), plus epoch-2-only cases: a re-open of dead key 3 and a
  // brand-new key 4 the base has never seen.
  private def epoch1 = log.filter(col("seq") <= 2)
  private def epoch2 = Seq(
    (1L, 7, "U", 14.0), // re-open after this epoch's own delete
    (1L, 5, "D", 0.0),  // closes the version epoch 1 left open
    (3L, 6, "U", 31.0), // re-open of a key epoch 1 killed
    (4L, 5, "U", 40.0)  // insert: no base history at all
  ).toDF("k", "seq", "op", "v")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "valid_from", "valid_to", "is_current", "v")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2), r.getBoolean(3), r.getDouble(4)))
      .toSet

  test("refreshType2 == buildType2 over the concatenated log") {
    val refreshed = Scd.refreshType2(
      Scd.buildType2(epoch1, "k", "seq", "op"), epoch2, "k", "seq", "op")
    val backfilled = Scd.buildType2(epoch1.unionByName(epoch2), "k", "seq", "op")
    assert(canon(refreshed) == canon(backfilled))
    // And the combined log here IS the class fixture's log + the key-3
    // re-open + key 4, so the expected set is explicit, not just
    // self-consistent. Key 3's dead version stays closed (valid_to 1 from
    // epoch 1's delete — the refresh must not touch non-current rows) and
    // its epoch-2 re-open is the only new current version.
    assert(canon(refreshed) == versions +
      ((3L, 6, -1, true, 31.0)) + ((4L, 5, -1, true, 40.0)))
  }

  test("refreshType2 with a delete-only epoch closes and adds nothing") {
    val delOnly = Seq((2L, 9, "D", 0.0)).toDF("k", "seq", "op", "v")
    val got = canon(Scd.refreshType2(
      Scd.buildType2(epoch1, "k", "seq", "op"), delOnly, "k", "seq", "op"))
    assert(got == Set(
      (1L, 0, 2, false, 10.0), (1L, 2, -1, true, 12.0),
      (2L, 0, 9, false, 20.0), // closed at the delete's seq, no new version
      (3L, 0, 1, false, 30.0)))
  }

  test("a small changeset never shuffles the dimension") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val parquetDim = {
      val dir = java.nio.file.Files.createTempDirectory("scd-dim").toString
      Tables.documents(spark, SparkFixture.Sf0001)
        .select(col("doc_id").as("k"), lit(0).as("valid_from"),
          col("lang").as("v"), lit(null).cast("int").as("valid_to"),
          lit(true).as("is_current"))
        .write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    }
    val changes = Seq((1L, 5, "U", "de"), (9999991L, 5, "U", "fr"))
      .toDF("k", "seq", "op", "v")
    val df = Scd.refreshType2(parquetDim, changes, "k", "seq", "op")
    val plan = PlanCheck.finalPlan(df)
    def scansDim(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      PlanCheck.flatten(p).exists(_.isInstanceOf[FileSourceScanExec])
    assert(scansDim(plan), s"expected the parquet dim scan in:\n$plan")
    val dimShuffles = PlanCheck.flatten(plan).count {
      case e: ShuffleExchangeLike => scansDim(e)
      case _ => false
    }
    assert(dimShuffles == 0, s"dimension was shuffled:\n$plan")
  }
}
