package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries frequent-items sketch (functions/FreqSketch) — the
  * published guarantees, verified empirically against exact counts, plus
  * the heavy-hitters operator's partition invariance. */
class FreqSketchSpec extends AnyFunSuite {
  import SparkFixture._

  /** Zipf-ish synthetic stream: token t_i appears ~N/(i+1) times —
    * heavy head, long tail, deterministic. */
  private def zipfTokens(nDistinct: Int, scale: Int): Seq[String] =
    (0 until nDistinct).flatMap(i => Seq.fill(math.max(1, scale / (i + 1)))(s"t$i"))

  private def summarize(tokens: Seq[String], cap: Int, parts: Int): Map[String, Long] = {
    import spark.implicits._
    tokens.toDF("token").repartition(parts)
      .agg(graft.functions.FreqSketch.misraGries(col("token"), cap).as("mg"))
      .head().getMap[String, Long](0).toMap
  }

  test("exact when distinct values fit the capacity") {
    val tokens = zipfTokens(nDistinct = 40, scale = 300)
    val truth = tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 7)) {
      val got = summarize(tokens, cap = 64, parts)
      assert(got == truth, s"parts=$parts: capacity-covered summary must be exact")
    }
  }

  test("MG guarantee holds vs exact counts across partitionings: est <= true <= est + (N-S)/(cap+1)") {
    val cap = 32
    val tokens = zipfTokens(nDistinct = 500, scale = 2000)
    val truth = tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = tokens.size.toLong
    for (parts <- Seq(1, 3, 11)) {
      val got = summarize(tokens, cap, parts)
      assert(got.size <= cap)
      val err = (n - got.values.sum).toDouble / (cap + 1)
      for ((t, est) <- got) {
        val tru = truth(t)
        assert(est <= tru, s"parts=$parts: overcount $t est=$est true=$tru")
        assert(tru <= est + err,
          s"parts=$parts: bound broken for $t: true=$tru est=$est err=$err")
      }
      // Absent tokens are bounded by the same ledger.
      for ((t, tru) <- truth if !got.contains(t))
        assert(tru <= err, s"parts=$parts: unseen $t true=$tru > err=$err")
      // The heavy head always survives: anything with true count > err is
      // guaranteed present — the candidate-superset property the two-pass
      // exact top-k rests on.
      for ((t, tru) <- truth if tru > err)
        assert(got.contains(t), s"parts=$parts: heavy $t (true=$tru, err=$err) missing")
    }
  }

  test("q_agg_heavyhitters output is partition-invariant and equals the full groupBy") {
    val base = SparkEntry.queries("q_agg_heavyhitters")(spark, Sf0001)
      .collect().map(_.toSeq).toSeq
    graft.operators.ScaleOps.releaseTracked()
    val full = Tables.documents(spark, Sf0001)
      .select(explode(split(lower(col("text")), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(10)
      .collect().map(_.toSeq).toSeq
    assert(base == full, "sketch-path top-10 != full-groupBy top-10")
  }
}
