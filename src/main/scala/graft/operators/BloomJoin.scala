package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BloomMightContain

/** BLOOM-FILTER SEMI-JOIN REDUCTION — probe the fact scan against a Bloom
  * filter of the dimension side's join keys BEFORE the shuffle join, so
  * rows that cannot match never enter the exchange. At 100 TB this is the
  * difference between shuffling the corpus and shuffling the (say) 5% of
  * it a selective dimension predicate survives — the same move Spark's
  * AQE runtime row-level filtering makes, done here explicitly so the
  * build is gated, sized from an exact key count, and visible in the plan
  * (`bloom_might_contain` in the scan-side Filter).
  */
object BloomJoin {

  /** Default build-side cap: past this many distinct keys the filter stops
    * paying (≈4.7 MiB serialized at fpp 0.01 — the task-binary weight of a
    * small broadcast) and the fact shuffle is likely no longer the
    * bottleneck relative to the dim. Mirrors the 4M-row default of Spark's
    * own runtime bloom filter creation threshold. */
  val MaxBuildKeys = 4000000L

  /** Prefilter `fact` to rows whose `factKey` MIGHT appear in `dimKeys`'s
    * single (long-castable) column. Semantically invisible: false
    * positives survive and must be removed by the real join downstream;
    * false negatives cannot occur. Returns `fact` unchanged when the build
    * side is empty (the join output is empty anyway, no filter needed) or
    * above `maxBuildKeys` (a filter that big costs more than it saves).
    *
    * Cost: one column-pruned count + one aggregation job over the DIM side
    * (both trivially parallel, both tiny next to one avoided corpus
    * shuffle), and a driver-held filter of ~1.2 bytes/key at fpp 0.01 that
    * ships to executors once in the codegen reference array. */
  def prefilter(fact: DataFrame, factKey: String, dimKeys: DataFrame,
                maxBuildKeys: Long = MaxBuildKeys,
                fpp: Double = 0.01): DataFrame = {
    val keyName = dimKeys.columns.head
    val keys = dimKeys.select(col(keyName).cast("long").as(keyName))
    val n = keys.count()
    if (n == 0L || n > maxBuildKeys) return fact
    val bf = keys.stat.bloomFilter(keyName, n, fpp)
    val bytes = {
      val bos = new ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    BloomMightContain.register(fact.sparkSession)
    fact.filter(call_function("bloom_might_contain",
      col(factKey).cast("long"), lit(bytes)))
  }
}
