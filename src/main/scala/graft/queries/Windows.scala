package graft.queries

import graft.Tables
import graft.functions.Det.dsumOver
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function contract — SURVEY.md §2.6.
  *
  * Every window's ORDER BY carries a unique-key tiebreak so row_number/ntile
  * are well-defined; rank/dense_rank windows are value-ordered so ties rank
  * identically in any engine. Windowed float sums go through the exact
  * decimal path (Det.dsumOver) because window aggregation engines differ in
  * partial-sum order (SURVEY.md §2.9).
  *
  * Scale posture: all per-entity windows partition by a key (customer/user),
  * so at 100 TB each partition is small and the single shuffle hash-
  * distributes evenly. The two whole-table windows (q_window_range partitions
  * only by 3-value status, q_window_ntile is global) are declared semantics —
  * the cluster-scale form would pre-bucket by range boundaries or use
  * approx quantiles; noted inline.
  */
object Windows {

  type Q = (SparkSession, String) => DataFrame

  /** Top-3 orders per customer: row_number (unique-tiebroken) alongside
    * rank/dense_rank (value-ordered, tie-aware) — the reference's P3
    * per-group top-k shape. */
  val qWindowRank: Q = (s, dir) => {
    val wUnique = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val wValue = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc)
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(wUnique).cast("long").as("rn"),
        rank().over(wValue).cast("long").as("rnk"),
        dense_rank().over(wValue).cast("long").as("drnk"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Running revenue per customer in orderdate order (cumulative frame). */
  val qWindowRunning: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        dsumOver(col("o_totalprice"), w).as("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** Inter-event gaps per user: lag/lead + partition-wide first/last.
    * Gap kept as integer microseconds — no float at all. */
  val qWindowLag: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, dir)
      .select(
        col("event_id"), col("user_id"), col("ts"),
        (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))).as("gap_us"),
        (unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts"))).as("next_us"),
        first(col("event_id")).over(wAll).as("first_event"),
        last(col("event_id")).over(wAll).as("last_event"))
      .orderBy("event_id")
  }

  /** Value-range frame: per status, sum/count of orders priced within ±5000.
    * At 100 TB a 3-way partition key is a skew hazard — the scale form
    * range-buckets o_totalprice into width-5000 bins, aggregates per bin, and
    * joins each row to its bin±1 partials instead of sorting whole
    * partitions. */
  val qWindowRange: Q = (s, dir) => {
    // Frame over integer cents: Spark's rangeBetween(Long) needs an integral
    // ordering column, and integer band edges are engine-portable (no double
    // boundary comparisons).
    val cents = round(col("o_totalprice") * 100).cast("long")
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("price_cents"))
      .rangeBetween(-500000L, 500000L)
    Tables.orders(s, dir)
      .withColumn("price_cents", cents)
      .select(
        col("o_orderstatus"), col("o_orderkey"), col("price_cents"),
        count(lit(1)).over(w).as("n_band"),
        dsumOver(col("o_totalprice"), w).as("band_spend"))
      .orderBy(col("o_orderstatus"), col("price_cents"), col("o_orderkey"))
  }

  /** Quartile bucket + percent_rank of customers by acctbal. Global window
    * is intentional declared semantics; the 100 TB form computes quartile
    * edges via approx_percentile and assigns by comparison (no global sort). */
  val qWindowNtile: Q = (s, dir) => {
    val w = Window.orderBy(col("c_acctbal").desc, col("c_custkey"))
    val wValue = Window.orderBy(col("c_acctbal").desc)
    Tables.customer(s, dir)
      .select(
        col("c_custkey"), col("c_acctbal"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(wValue), 6).as("pct_rank"))
      .orderBy("c_custkey")
  }

  val queries: Map[String, Q] = Map(
    "q_window_rank" -> qWindowRank,
    "q_window_running" -> qWindowRunning,
    "q_window_lag" -> qWindowLag,
    "q_window_range" -> qWindowRange,
    "q_window_ntile" -> qWindowNtile)
}
