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

  /** Byte budget for the FPP-ESCALATED build past `maxBuildKeys` (r12
    * stretch): giving up the reduction exactly when the fact shuffle is
    * biggest wastes the regime where it pays most, so past the cap the
    * filter is rebuilt at whatever fpp this budget affords
    * (bits-per-key = budget×8 / distinct keys; expected fpp ≈
    * 0.6185^(bits/key) at the optimal hash count). A fpp-0.3 filter still
    * deletes 70% of the non-matching fact scan before the exchange. The
    * 16 MiB ships ONCE per executor through the codegen reference array —
    * heap noise beside a corpus shuffle — and keeps the escalation useful
    * to ~90M distinct keys (fpp 0.5 floor below); beyond that the probe
    * passes most rows and the operator degrades to identity as before. */
  val EscalationBudgetBytes: Long = 16L << 20

  /** Expected fpp past which an escalated filter stops paying: at 0.5
    * every second non-matching row survives the probe anyway, so the
    * per-row probe cost outweighs the shuffle reduction. */
  val EscalationMaxFpp = 0.5

  /** Prefilter `fact` to rows whose `factKey` MIGHT appear in `dimKeys`'s
    * single column. Both key columns must be INTEGRAL types (byte/short/
    * int/long — widened to long for the probe): a lossy cast (string,
    * decimal, …) can turn a real key into null and silently DROP rows the
    * join would match — a false-negative hazard, so it throws instead.
    * Semantically invisible otherwise: false positives survive and must be
    * removed by the real join downstream; false negatives cannot occur.
    * Returns `fact` unchanged when the build side is empty (the join
    * output is empty anyway, no filter needed). Above `maxBuildKeys`
    * DISTINCT keys the build ESCALATES instead of giving up: the filter is
    * rebuilt inside `escalationBudgetBytes` at the fpp those bits afford
    * (see [[EscalationBudgetBytes]]); only past the [[EscalationMaxFpp]]
    * floor — where the probe passes most rows anyway — does the operator
    * fall back to identity.
    *
    * Cost: ONE aggregation job over the persisted dim-key column (count +
    * sizing estimate together) + the filter-build job over the same cache
    * (both tiny next to one avoided corpus shuffle), and a driver-held
    * filter of ~1.2 bytes/distinct-key at fpp 0.01 that ships to executors
    * once in the codegen reference array. The filter is SIZED from the
    * distinct-key estimate, not the row count — a dim side carrying
    * duplicate keys (post-join derivations) no longer over-allocates. The
    * downstream join re-evaluates the caller's own dim subtree; callers
    * joining an expensive derivation should persist it themselves. */
  def prefilter(fact: DataFrame, factKey: String, dimKeys: DataFrame,
                maxBuildKeys: Long = MaxBuildKeys,
                fpp: Double = 0.01,
                escalationBudgetBytes: Long = EscalationBudgetBytes): DataFrame = {
    val keyName = dimKeys.columns.head
    val integral: Set[org.apache.spark.sql.types.DataType] = Set(
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    val dimType = dimKeys.schema.head.dataType
    val factType = fact.schema(factKey).dataType
    require(integral(dimType) && integral(factType),
      s"BloomJoin.prefilter needs integral join keys; got dim $keyName: " +
        s"${dimType.sql}, fact $factKey: ${factType.sql} — a lossy cast " +
        "could null out real keys and drop matching rows")
    val keys = dimKeys.select(col(keyName).cast("long").as(keyName))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val row = keys.agg(count(lit(1)).as("n"),
        approx_count_distinct(col(keyName)).as("nd")).head()
      val (n, nd) = (row.getLong(0), row.getLong(1))
      if (n == 0L) return fact
      val bf =
        if (nd <= maxBuildKeys) keys.stat.bloomFilter(keyName, math.max(nd, 1L), fpp)
        else {
          val bits = escalationBudgetBytes * 8L
          // Optimal-hash-count fpp for m bits over n keys: (1/2)^(m/n·ln2)
          // = 0.6185^(m/n).
          val expFpp = math.pow(0.6185, bits.toDouble / nd)
          if (expFpp > EscalationMaxFpp) return fact
          keys.stat.bloomFilter(keyName, math.max(nd, 1L), bits)
        }
      val bytes = {
        val bos = new ByteArrayOutputStream()
        bf.writeTo(bos)
        bos.toByteArray
      }
      BloomMightContain.register(fact.sparkSession)
      fact.filter(call_function("bloom_might_contain",
        col(factKey).cast("long"), lit(bytes)))
    } finally keys.unpersist(blocking = false)
  }
}
