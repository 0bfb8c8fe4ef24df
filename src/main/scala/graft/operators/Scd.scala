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
}
