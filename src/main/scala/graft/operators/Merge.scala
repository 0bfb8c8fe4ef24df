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
    val latest = latestPerKey(changes, key, seqCol, opCol, payload)
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

  /** Reduce a changeset to ONE latest row per key — max_by over a hash
    * aggregation that shuffles only the changes (ties on `seqCol` within a
    * key are the caller's contract violation; "latest" must be unique). */
  private def latestPerKey(changes: DataFrame, key: String, seqCol: String,
                           opCol: String, payload: Seq[String]): DataFrame =
    changes
      .groupBy(col(key))
      .agg(max_by(
        struct(col(opCol).as("__op") +: payload.map(col): _*),
        col(seqCol)).as("__m"))
      .select(col(key) +: col("__m.__op").as("__op") +:
        payload.map(p => col(s"__m.`$p`").as(s"__u_$p")): _*)

  /** CHANGE DATA FEED — the row-level diff a [[applyCdc]] fold WOULD apply,
    * emitted instead of (or alongside) the merged snapshot: one row per
    * effective change with `change_type` ∈ insert / update / delete and the
    * full pre- and post-image payload (`old_*` / `new_*` columns). This is
    * Delta Lake's table_changes / Debezium's envelope re-expressed: at
    * 100 TB downstream consumers (cache invalidation, incremental
    * aggregate maintenance, audit) subscribe to the FEED — corpus-sized
    * re-diffs of two snapshots are exactly what the feed exists to avoid.
    *
    * Semantics (latest-wins per key, like applyCdc): an upsert on a
    * present key → `update` (pre = base row, post = change payload); a
    * delete on a present key → `delete` (post-image null); an upsert on an
    * absent key → `insert` (pre-image null); a delete on an absent key is
    * a no-op and emits nothing. The feed is changeset-sized.
    *
    * Plan: the matched arm is base INNER-join latest (gated broadcast —
    * the base is never shuffled below the gate, and its scan feeds a
    * changeset-sized join output); the insert arm reuses applyCdc's
    * key-scan semi/anti shape, so the anti join runs on two
    * changeset-sized inputs. Above the gate both arms degrade to
    * co-partitioned shuffle joins, and a bucketed base exchanges nothing
    * (the MergeSpec composition applies verbatim). */
  def changeFeed(base: DataFrame, changes: DataFrame, key: String,
                 seqCol: String, opCol: String,
                 broadcastGateBytes: Long = graft.Conf.BroadcastMaxBytes / 4): DataFrame = {
    val payload = base.columns.filterNot(_ == key).toSeq
    val types = base.schema.fields.map(f => f.name -> f.dataType).toMap
    val latest = latestPerKey(changes, key, seqCol, opCol, payload)
    val gated = ScaleOps.broadcastIfSourceSmall(latest, changes, broadcastGateBytes)
    val matched = base.join(gated, Seq(key), "inner")
      .select(col(key) +:
        when(col("__op") === "D", lit("delete"))
          .otherwise(lit("update")).as("change_type") +:
        (payload.map(p => col(s"`$p`").as(s"old_$p")) ++
         payload.map(p => when(col("__op") === "D",
             lit(null).cast(types(p))).otherwise(col(s"__u_$p"))
           .as(s"new_$p"))): _*)
    val existing = base.select(col(key)).join(
      ScaleOps.broadcastIfSourceSmall(latest.select(col(key)), changes,
        broadcastGateBytes),
      Seq(key), "left_semi")
    val inserts = latest.filter(col("__op") =!= "D")
      .join(existing, Seq(key), "left_anti")
      .select(col(key) +: lit("insert").as("change_type") +:
        (payload.map(p => lit(null).cast(types(p)).as(s"old_$p")) ++
         payload.map(p => col(s"__u_$p").as(s"new_$p"))): _*)
    matched.unionByName(inserts)
  }
}
