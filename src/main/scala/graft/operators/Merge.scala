package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC MERGE — apply a changeset (upserts + deletes) to a base snapshot,
  * latest-wins per key. The maintenance primitive behind every warehouse
  * MERGE INTO / SCD-1 refresh: a 100 TB snapshot is never rewritten row by
  * row; a small change stream is folded into it once per tick.
  */
object Merge {

  /** Fold `changes` into `base`.
    *
    * Contract: `base` has one row per `key` (it is a snapshot). `changes`
    * carries `key`, `seqCol` (per-key change order, unique within a key —
    * ties would make "latest" ambiguous), `opCol` (`'U'` upsert — full
    * payload present; `'D'` delete — payload ignored), and every `base`
    * column. Output schema == base schema. A delete for an absent key is a
    * no-op; an upsert for an absent key is an insert.
    *
    * Plan, sized for the real CDC shape (changes ≪ base): the changeset
    * first reduces to ONE latest row per key — max_by over a hash
    * aggregation that shuffles only the changes. Then two arms, neither of
    * which shuffles the snapshot below the broadcast gate:
    *  - MATCHED: base LEFT-joins the latest changes (gated broadcast —
    *    deliberately not a full outer join, which no broadcast strategy
    *    supports and which would therefore sort-merge the corpus):
    *    untouched rows pass through, updates take the change payload,
    *    deletes drop.
    *  - INSERTS: latest change keys absent from the base. The base
    *    contributes only its column-pruned key scan through a broadcast
    *    semi join, so the anti join runs on two changeset-sized inputs.
    * The base is scanned twice but EXCHANGED zero times — at 100 TB the
    * second (single-column) scan is noise next to one corpus shuffle.
    * Above the gate both arms degrade to co-partitioned shuffle joins, and
    * a base laid out with [[graft.sources.Layout.writeBucketed]] on `key`
    * skips even those — its scan already satisfies the join's
    * distribution, so only the changeset exchanges (MergeSpec composes the
    * two and pins zero base-side exchanges with the gate forced off).
    * Never a window over base ∪ changes: that sorts the corpus to fold in
    * a trickle. `broadcastGateBytes` exists for that spec and for callers
    * with measured executor budgets; the default is the repo-wide
    * quarter-broadcast-budget convention. */
  def applyCdc(base: DataFrame, changes: DataFrame, key: String,
               seqCol: String, opCol: String,
               broadcastGateBytes: Long = graft.Conf.BroadcastMaxBytes / 4): DataFrame = {
    val payload = base.columns.filterNot(_ == key).toSeq
    val latest = changes
      .groupBy(col(key))
      .agg(max_by(
        struct(col(opCol).as("__op") +: payload.map(col): _*),
        col(seqCol)).as("__m"))
      .select(col(key) +: col("__m.__op").as("__op") +:
        payload.map(p => col(s"__m.`$p`").as(s"__u_$p")): _*)
    val gated = ScaleOps.broadcastIfSourceSmall(latest, changes, broadcastGateBytes)
    val merged = base.join(gated, Seq(key), "left_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(col(key) +: payload.map(p =>
        when(col("__op").isNotNull, col(s"__u_$p")).otherwise(col(p)).as(p)): _*)
    val existing = base.select(col(key)).join(
      ScaleOps.broadcastIfSourceSmall(latest.select(col(key)), changes,
        broadcastGateBytes),
      Seq(key), "left_semi")
    val inserts = latest.filter(col("__op") =!= "D")
      .join(existing, Seq(key), "left_anti")
      .select(col(key) +: payload.map(p => col(s"__u_$p").as(p)): _*)
    merged.unionByName(inserts)
  }
}
