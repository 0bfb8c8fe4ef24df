package graft.queries

import graft.Tables
import graft.functions.Det.dsum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregations — SURVEY.md §2.10, batch forms.
  *
  * Each query uses the exact Structured Streaming time primitives
  * (`window()`, `session_window()`) executed in batch mode: event-time logic
  * is identical in both modes, which is what makes these hash-checkable
  * against a SQL oracle while streaming/Runtime.scala runs the same
  * aggregations as real incremental streams (equivalence asserted in tests).
  *
  * Scale posture: tumbling/sliding windows group by (window, type) — pure
  * hash-partitioned aggregation with map-side partials; session windows
  * shuffle by user_id and sort-merge sessions per user — at 100 TB the
  * per-user partitions are small and uniformly distributed.
  */
object StreamingQs {

  type Q = (SparkSession, String) => DataFrame

  /** 1-hour tumbling windows: count + value sum per (window, event_type). */
  val qStreamTumbling: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("w_start", "event_type")

  /** 1-hour windows sliding every 30 minutes — each event lands in exactly
    * two windows (epoch-aligned starts, same grid as the oracle's
    * time_bucket arithmetic). */
  val qStreamSliding: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("sum_value"))
      .select(col("w.start").as("w_start"), col("n"), col("sum_value"))
      .orderBy("w_start")

  /** Per-user sessions with a 30-minute inactivity gap. Spark's
    * session_window end = last event + gap, and a gap of EXACTLY the
    * duration starts a new session (merge requires strict overlap) — the
    * gaps-and-islands oracle mirrors both conventions (`>=` on the gap,
    * `max(ts) + 30 min` as the end). */
  val qStreamSession: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), 6).as("sum_value"))
      .select(col("user_id"), col("sw.start").as("s_start"), col("sw.end").as("s_end"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "s_start")

  val queries: Map[String, Q] = Map(
    "q_stream_tumbling" -> qStreamTumbling,
    "q_stream_sliding" -> qStreamSliding,
    "q_stream_session" -> qStreamSession)
}
