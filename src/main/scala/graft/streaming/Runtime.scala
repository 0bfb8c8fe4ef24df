package graft.streaming

import graft.Tables
import graft.functions.Det.dsum
import graft.sources.Layout
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming runtime — SURVEY.md §2.10's runtime half.
  *
  * The batch forms in queries/StreamingQs.scala define the semantics; this
  * module runs the same event-time aggregations as REAL incremental streams
  * (file source replaying the events parquet, watermark, memory sink) so
  * tests can assert stream == batch. At cluster scale the same code points
  * `readStream` at an arriving-file directory (or Kafka) and the sink at
  * partitioned parquet via `foreachBatch` — only source/sink options change.
  */
object Runtime {

  /** The events table as a file-source stream (one file → one micro-batch;
    * `maxFilesPerTrigger=1` keeps replay deterministic). Schema comes from a
    * batch peek — required by file streaming sources. The raw nanos `ts`
    * long is decoded exactly like the batch path.
    *
    * File streaming sources watch a DIRECTORY for arriving files; the
    * testdata table is a single parquet file, so it is staged (once) into a
    * temp "arrivals" directory — exactly how files would land in production.
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    Tables.prep(spark)
    val src = java.nio.file.Paths.get(s"$dir/events.parquet")
    val streamDir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft-stream-${dir.replaceAll("[^A-Za-z0-9]", "_")}")
    java.nio.file.Files.createDirectories(streamDir)
    val dst = streamDir.resolve("events.parquet")
    // Always refresh: a stale copy from a previous run would silently
    // diverge from the batch side if the testdata were regenerated.
    java.nio.file.Files.copy(src, dst,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val schema = spark.read.parquet(src.toString).schema
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamDir.toString)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** 1-hour tumbling count+sum with a 1-hour watermark (late rows beyond
    * the watermark are dropped in append mode; the equivalence test replays
    * in order, so batch == stream). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))

  /** 1-hour windows sliding every 30 minutes as a stream. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("sum_value"))
      .select(col("w.start").as("w_start"), col("n"), col("sum_value"))

  /** Per-user 30-minute-gap sessions with watermark — streaming
    * session_window requires one. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("s_start"),
        col("sw.end").as("s_end"), col("n_events"))

  /** The events stream with every file staged TWICE (two arrival files →
    * two micro-batches under maxFilesPerTrigger=1) — the at-least-once
    * redelivery shape every streaming ingest must survive. Fixture for
    * [[dedupedEvents]]. */
  def eventsStreamWithRedelivery(spark: SparkSession, dir: String): DataFrame = {
    Tables.prep(spark)
    val src = java.nio.file.Paths.get(s"$dir/events.parquet")
    val streamDir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft-stream-redeliver-${dir.replaceAll("[^A-Za-z0-9]", "_")}")
    java.nio.file.Files.createDirectories(streamDir)
    for (name <- Seq("events_a.parquet", "events_b.parquet"))
      java.nio.file.Files.copy(src, streamDir.resolve(name),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val schema = spark.read.parquet(src.toString).schema
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamDir.toString)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Streaming ingest DEDUPLICATION — the stream-side member of the dedup
    * family (the batch members live in queries/LlmOps): exactly-once
    * semantics on top of an at-least-once source via
    * `dropDuplicatesWithinWatermark` on the record key.
    *
    * Scale posture: state is hash-partitioned by key across the cluster
    * (same shuffle shape as a streaming aggregation) and — unlike a plain
    * `dropDuplicates`, whose state grows forever — every key is EVICTED
    * once the watermark passes its event time, so state is bounded by the
    * redelivery horizon, not the stream's lifetime. For content dedup of a
    * document stream, the key becomes md5(text) — same state machine. */
  def dedupedEvents(events: DataFrame, horizon: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("event_id")

  /** Run an APPEND-mode stream (stateless transforms, watermark dedup) to
    * completion against the replayed file source — append twin of
    * [[runToCompletion]] (dedup/stateless plans reject complete mode). */
  def runToCompletionAppend(spark: SparkSession, df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val finished = q.awaitTermination(120000L)
    if (!finished) {
      q.stop()
      throw new IllegalStateException(
        s"stream $name did not finish within 120s — result would be partial")
    }
    spark.table(name)
  }

  /** The PRODUCTION sink (SURVEY §2.10's "foreachBatch parquet sink"): run
    * a stream through `foreachBatch` into a hive-style partitioned parquet
    * layout via Layout.writePartitioned — the same pruning-friendly on-disk
    * posture batch jobs write, fed incrementally.
    *
    * Two supported mode pairings, both exactly-once at the directory level:
    *  - stateless/append rows + SaveMode.Append — each micro-batch's rows
    *    land once; the table is the union of batches (classic streaming
    *    ETL ingest);
    *  - stateful aggregation in "complete" mode + SaveMode.Overwrite — each
    *    micro-batch rewrites the full aggregate, so the directory always
    *    holds the latest complete result (compact dashboards/rollups).
    * The checkpoint carries source offsets, so a restart resumes instead of
    * replaying from scratch. Shuffle shape inside each batch is
    * Layout.writePartitioned's: redistribute by (partitionCol, row-hash
    * bucket) — full cluster parallelism, bounded files per partition dir. */
  def runToPartitionedParquet(agg: DataFrame, path: String, checkpoint: String,
                              partitionCol: String, outputMode: String,
                              saveMode: SaveMode,
                              filesPerPartition: Int = 1): Unit = {
    val q = agg.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Layout.writePartitioned(batch, path, partitionCol, filesPerPartition, saveMode)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val finished = q.awaitTermination(120000L)
    if (!finished) {
      q.stop()
      throw new IllegalStateException(
        s"stream into $path did not finish within 120s — sink would be partial")
    }
  }

  /** Run a streaming aggregation to completion against the replayed file
    * source and return the final result as a DataFrame (memory sink,
    * complete mode). Driver for the stream==batch equivalence tests. */
  def runToCompletion(spark: SparkSession, agg: DataFrame, name: String): DataFrame = {
    val q = agg.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val finished = q.awaitTermination(120000L)
    if (!finished) {
      q.stop()
      throw new IllegalStateException(
        s"stream $name did not finish within 120s — result would be partial")
    }
    spark.table(name)
  }
}
