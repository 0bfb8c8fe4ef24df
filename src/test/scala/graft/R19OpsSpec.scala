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

  test("q_ml_eval_ranking: metrics equal an independent driver-side recomputation (sf0.001)") {
    val got = SparkEntry.queries("q_ml_eval_ranking")(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == 20)
    // Independent recomputation: plain-Scala distances (the same sequential
    // left-to-right double fold Vec.dot pins), ranks, and IR metrics.
    val rows = Tables.embeddings(spark, Sf0001)
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nLabel = rows.groupBy(_._3).map { case (l, v) => l -> v.length }
    val gains = (1 to 10).map(i =>
      BigDecimal(r6(1.0 / (math.log(i + 1.0) / math.log(2.0)))))
    for ((qid, qe, qlabel) <- rows.filter(_._1 <= 19)) {
      val top = rows.filter(_._1 != qid)
        .map { case (id, e, l) =>
          (math.sqrt(math.max(dot(e, e) + dot(qe, qe) - 2.0 * dot(e, qe), 0.0)),
            id, l) }
        .sortBy(t => (t._1, t._2)).take(10)
      val rel = top.map(_._3 == qlabel)
      val hits = rel.count(identity)
      val nRel = nLabel(qlabel) - 1
      val dcg = rel.zipWithIndex.collect { case (true, i) => gains(i) }.sum
      val idcg = gains.take(math.min(10, nRel)).sum
      val firstRel = rel.indexOf(true)
      val row = got(qid)
      assert(row.getLong(1) == nRel, s"n_rel qid=$qid")
      assert(row.getLong(2) == hits, s"hits qid=$qid")
      assert(row.getDouble(3) == r6(hits.toDouble / nRel), s"recall qid=$qid")
      assert(row.getDouble(4) ==
        (if (firstRel < 0) 0.0 else r6(1.0 / (firstRel + 1))), s"mrr qid=$qid")
      assert(row.getDouble(5) == r6(dcg.toDouble / idcg.toDouble), s"ndcg qid=$qid")
    }
  }

  test("q_quality_drift_embed: exactly the planted label fires; unchanged labels give PSI exactly 0") {
    for (sf <- Seq(Sf0001, Sf001)) {
      val got = SparkEntry.queries("q_quality_drift_embed")(spark, sf).collect()
      assert(got.length == 10, s"one PSI row per label at $sf")
      for (r <- got) {
        val label = r.getInt(0)
        // Same-rows design: cohort sizes are identical by construction.
        assert(r.getLong(1) == r.getLong(2), s"n_ref != n_cur at $sf label=$label")
        if (label == 0) {
          assert(r.getDouble(3) > 0.1, s"planted label PSI too small at $sf")
          assert(r.getLong(4) == 1L, s"planted label did not flag at $sf")
        } else {
          assert(r.getDouble(3) == 0.0, s"unchanged label $label has nonzero PSI at $sf")
          assert(r.getLong(4) == 0L, s"unchanged label $label flagged at $sf")
        }
      }
    }
  }
}
