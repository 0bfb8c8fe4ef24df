package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sizing arithmetic: spill-free partition counts at every scale. */
class ConfSpec extends AnyFunSuite {

  test("shuffle partitions track data volume at 128MB per partition") {
    // 10 TB shuffled on 1000 executors x 8 cores -> 81920 partitions.
    val p = Conf.shufflePartitions(10L << 40, totalCores = 8000)
    assert(p == math.ceil((10L << 40).toDouble / (128L << 20)).toInt)
    assert((10L << 40) / p <= (128L << 20))
    // A raw 100 TB shuffle hits the scheduler ceiling instead (bigger
    // partitions, bounded task count) — the documented trade.
    assert(Conf.shufflePartitions(100L << 40, 8000) == Conf.MaxShufflePartitions)
  }

  test("never fewer partitions than cores, never above the ceiling") {
    assert(Conf.shufflePartitions(1L << 20, totalCores = 64) == 64)
    assert(Conf.shufflePartitions(Long.MaxValue / 4, totalCores = 8000) ==
      Conf.MaxShufflePartitions)
  }

  test("forScale carries the AQE trio and pinned split size") {
    val m = Conf.forScale(10L << 40, totalCores = 800, shuffleSelectivity = 0.25)
    assert(m("spark.sql.adaptive.enabled") == "true")
    assert(m("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(m("spark.sql.files.maxPartitionBytes") == (128L << 20).toString)
    // 10 TB * 0.25 selectivity = 2.5 TB -> 20480 partitions.
    assert(m("spark.sql.shuffle.partitions").toInt ==
      Conf.shufflePartitions((10L << 40) / 4, 800))
  }
}
