package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property layer for the r13 stats/profiling keys (the FunnelSpec
  * convention): random inputs vs driver-side brute-force folds that
  * replicate the declared arithmetic exactly — including dsum's
  * cast-to-DECIMAL(38,10) / exact-sum / round / scaled-integer dance, so
  * float comparisons are EXACT equality, not tolerance. */
class StatsSpec extends AnyFunSuite {
  import SparkFixture._

  // Det.dsum's driver twin lives in SparkFixture.dsumLike (shared with
  // R14OpsSpec so the twin cannot drift from itself).

  private def roundN(x: Double, n: Int): Double =
    java.math.BigDecimal.valueOf(x).setScale(n, java.math.RoundingMode.HALF_UP).doubleValue()

  private val ordersGen: Gen[List[(String, Double)]] =
    Gen.listOfN(300, for {
      st <- Gen.oneOf("F", "O", "P")
      // Cent-quantized prices across several bins, including exact bin
      // edges (k * 25000.0) — the floor-boundary case.
      cents <- Gen.choose(0L, 20000000L)
      edge <- Gen.oneOf(true, false, false)
    } yield (st, if (edge) (cents / 2500000L) * 25000.0 else cents / 100.0))

  test("property: histogram equals a brute-force fold (incl. exact bin edges)") {
    import spark.implicits._
    for (seed <- 1 to 6) {
      val rows = ordersGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val dir = java.nio.file.Files.createTempDirectory("graft-stats-hist")
      try {
        rows.zipWithIndex.map { case ((st, p), i) => (i.toLong, st, p) }
          .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
          .write.parquet(dir.resolve("orders.parquet").toString)
        val got = SparkEntry.queries("q_agg_histogram")(spark, dir.toString)
          .collect()
          .map(r => ((r.getString(0), r.getLong(1)),
            (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
        val exp = rows.groupBy { case (st, p) => (st, math.floor(p / 25000.0).toLong) }
          .map { case ((st, bin), vs) =>
            (st, bin) -> ((bin * 25000L, (bin + 1L) * 25000L,
              vs.size.toLong, dsumLike(vs.map(_._2), 2)))
          }
        assert(got == exp, s"seed $seed: got $got expected $exp")
      } finally Tables.deleteRecursively(dir.toString)
    }
  }

  private val eventsGen: Gen[List[(String, Double)]] =
    Gen.listOfN(400, for {
      t <- Gen.oneOf("click", "view", "purchase")
      // Mostly bulk values with a planted heavy tail so outliers exist.
      heavy <- Gen.oneOf(true, false, false, false, false)
      v <- if (heavy) Gen.choose(200.0, 600.0) else Gen.choose(0.0, 50.0)
    } yield (t, math.rint(v * 100) / 100))

  test("property: z-score outliers equal a brute-force fold (exact model arithmetic)") {
    import spark.implicits._
    for (seed <- 11 to 16) {
      val rows = eventsGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val dir = java.nio.file.Files.createTempDirectory("graft-stats-outl")
      try {
        rows.zipWithIndex.map { case ((t, v), i) =>
          (i.toLong, t, v, 1L, "1970-01-01 00:00:00", "{}")
        }.toDF("event_id", "event_type", "value", "user_id", "tss", "props")
          .select(col("event_id"), to_timestamp(col("tss")).as("ts"),
            col("user_id"), col("event_type"), col("value"), col("props"))
          .write.parquet(dir.resolve("events.parquet").toString)
        val got = SparkEntry.queries("q_stats_outliers")(spark, dir.toString)
          .collect()
          .map(r => (r.getLong(1), (r.getString(0), r.getDouble(2), r.getDouble(3))))
          .toMap
        val exp = rows.zipWithIndex.groupBy(_._1._1).flatMap { case (t, es) =>
          val vs = es.map(_._1._2)
          val n = vs.size
          val s1 = dsumLike(vs, 6)
          val s2 = dsumLike(vs.map(v => v * v), 4)
          val mean = roundN(s1 / n, 6)
          val std = roundN(math.sqrt((s2 - s1 * s1 / n) / (n - 1)), 6)
          es.collect {
            case ((_, v), i) if math.abs(v - mean) > 2.5 * std =>
              i.toLong -> ((t, v, roundN((v - mean) / std, 4)))
          }
        }
        assert(got == exp, s"seed $seed: got ${got.size} expected ${exp.size} — $got vs $exp")
      } finally Tables.deleteRecursively(dir.toString)
    }
  }
}
