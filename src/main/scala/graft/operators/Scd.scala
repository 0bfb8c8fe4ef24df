package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD TYPE-2 — build a versioned dimension (validity intervals + current
  * flag) from a change log. The history-keeping sibling of [[Merge]]'s
  * latest-wins fold: where SCD-1 overwrites, SCD-2 closes the old version
  * and opens a new one, so every fact row can be joined to the dimension
  * AS OF its own timestamp.
  */
object Scd {

  /** Expand a change log into Type-2 version rows.
    *
    * Contract: `changes` carries `key`, `seqCol` (per-key change order,
    * unique within a key), `opCol` (`'U'` opens a version with the row's
    * payload; `'D'` closes the previous version and opens nothing), and the
    * payload columns. The log INCLUDES the initial load (each key's first
    * `'U'`). Output: one row per version with `valid_from` (= its seq),
    * `valid_to` (= the NEXT change's seq, null while open) and
    * `is_current`; `'D'` rows contribute only interval closure. A later
    * `'U'` after a `'D'` re-opens the key (close-reopen), which falls out
    * of the same window — no special casing.
    *
    * Plan: ONE hash shuffle of the change log by `key`, then a per-key
    * sorted window for `lead(seq)`. This is a DIMENSION-maintenance op —
    * the input is the dimension's change history (billions of rows at
    * most), never the fact corpus, and the window partitions by key, so
    * there is no single-task global sort at any scale. Incremental refresh
    * of an existing Type-2 table is the [[Merge.applyCdc]] shape (gated
    * join touching only open versions of changed keys); this builds the
    * history from scratch, the backfill path. */
  def buildType2(changes: DataFrame, key: String, seqCol: String,
                 opCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(seqCol))
    changes
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .filter(col(opCol) === "U")
      .withColumn("is_current", col("valid_to").isNull)
      .withColumnRenamed(seqCol, "valid_from")
      .drop(opCol)
  }

  /** Incremental Type-2 REFRESH — fold a new change epoch into an existing
    * Type-2 table (the output shape of [[buildType2]]) without re-windowing
    * the dimension. This is the op a dimension pipeline runs every tick;
    * [[buildType2]] is the one-time backfill.
    *
    * Contract: `dim` is a [[buildType2]]-shaped table (`key`, `valid_from`,
    * `valid_to`, `is_current`, payload). `changes` is the NEW epoch in the
    * [[buildType2]] input shape (`key`, `seqCol`, `opCol`, payload), and
    * every seq in it is GREATER than every seq already recorded for the
    * same key in `dim` — epochs arrive in order, the usual CDC contract.
    * Output == `buildType2` over the concatenated log (asserted in
    * ScdSpec), so refresh-per-tick and backfill-from-scratch are
    * interchangeable.
    *
    * Plan, sized for changes ≪ dim: the epoch alone is expanded to version
    * rows by the [[buildType2]] window (shuffles ONLY the epoch), and its
    * per-key first seq — the value that closes the key's open version —
    * comes from one changeset-sized aggregation. The dimension is touched
    * through a single gated-broadcast left join ([[Merge.applyCdc]]'s
    * shape): untouched keys stream through unmodified, and only the open
    * version of a changed key is rewritten (closed at the epoch's first
    * seq, `is_current` dropped). The dimension is never shuffled below the
    * broadcast gate and never windowed at any scale; above the gate the
    * join degrades to co-partitioned, and a dim laid out with
    * [[graft.sources.Layout.writeBucketed]] on `key` skips even that
    * exchange. A key absent from `dim` (insert) or whose versions are all
    * closed (re-open after delete) needs no closure — the epoch expansion
    * alone supplies its new rows. */
  def refreshType2(dim: DataFrame, changes: DataFrame, key: String,
                   seqCol: String, opCol: String): DataFrame = {
    val closers = changes.groupBy(col(key))
      .agg(min(col(seqCol)).as("__close_at"))
    val gated = ScaleOps.broadcastIfSourceSmall(closers, changes)
    val carried = dim.join(gated, Seq(key), "left_outer")
      .withColumn("valid_to",
        when(col("is_current") && col("__close_at").isNotNull,
          col("__close_at")).otherwise(col("valid_to")))
      .withColumn("is_current", col("is_current") && col("__close_at").isNull)
      .drop("__close_at")
    carried.unionByName(buildType2(changes, key, seqCol, opCol))
  }
}
