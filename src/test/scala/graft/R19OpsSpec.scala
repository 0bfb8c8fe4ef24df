package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-19 operator pins: the IVF staleness/rebuild lifecycle
  * (q_sim_ivf_rebuild). The graded keys carry their own sys.error
  * certificates; this spec re-pins them as assertions plus the physical
  * state the certificates cannot see from the result rows. */
class R19OpsSpec extends AnyFunSuite {
  import SparkFixture._

  test("q_sim_ivf_rebuild: no-flap, trigger fires on drift, rebuild clears it, tombstones fold") {
    val got = SparkEntry.queries("q_sim_ivf_rebuild")(spark, Sf0001).collect()
    assert(got.length == 3)
    val byPhase = got.map(r => r.getString(0) -> r).toMap
    // No-flap: a freshly built-and-tuned index must not fire the trigger.
    assert(byPhase("1_balanced").getLong(6) == 0, "fresh index flapped")
    // The distribution-shift ingest must fire it...
    assert(byPhase("2_stale").getLong(6) == 1, "drift never fired the trigger")
    // ...and the rebuild must clear it.
    assert(byPhase("3_rebuilt").getLong(6) == 0, "rebuild left the trigger set")
    // The statistic moves in the right direction: imbalance grows under
    // the frozen quantizer, recovers after the retrain.
    assert(byPhase("2_stale").getDouble(2) > byPhase("1_balanced").getDouble(2))
    assert(byPhase("3_rebuilt").getDouble(2) < byPhase("2_stale").getDouble(2))
    // Recall@10 vs survivor brute force recovers (>= stale − one slot).
    assert(byPhase("3_rebuilt").getDouble(5) >=
      byPhase("2_stale").getDouble(5) - 0.101, "recall did not recover")
    assert(byPhase("3_rebuilt").getDouble(5) >= 0.7)
    // Physical fold: the rebuild published a new generation and no
    // tombstoned id survives in its data files.
    val root = Tables.stageDir(spark, "ivf-rebuild", Sf0001)
    assert(ml.Ivf.dataRoot(root) != root, "rebuild did not publish a generation")
    val deleted = Tables.embeddings(spark, Sf0001)
      .filter(col("vec_id") % 10 === 3)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val remaining = spark.read.parquet(ml.Ivf.dataRoot(root))
      .filter(col("vec_id").isin(deleted.toSeq.map(java.lang.Long.valueOf): _*))
      .count()
    assert(remaining == 0, s"$remaining tombstoned row(s) survived the rebuild")
  }
}
