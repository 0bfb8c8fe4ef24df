package graft

import graft.streaming.{Runtime => SRuntime}
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming == batch equivalence (SURVEY §5.2): the §2.10 batch
  * forms define the semantics; the same aggregations run as real incremental
  * streams over a file-replayed events source must produce identical rows. */
class StreamingEquivSpec extends AnyFunSuite {
  import SparkFixture._

  test("tumbling window: stream result == batch result") {
    // The gate key itself now runs the append-mode stream; this test keeps
    // the complete-mode runtime pinned against the declared batch form.
    val stream = SRuntime.runToCompletion(spark,
      SRuntime.tumblingCounts(SRuntime.eventsStream(spark, Sf0001)), "t_tumbling")
    val batch = graft.queries.StreamingQs.tumblingBatchForm(spark, Sf0001)
    val got = stream.collect().map(_.toSeq).toSet
    val exp = batch.collect().map(_.toSeq).toSet
    assert(got.nonEmpty)
    assert(got == exp,
      s"missing=${(exp -- got).take(3)} extra=${(got -- exp).take(3)}")
  }

  test("sliding window: stream result == batch result") {
    val stream = SRuntime.runToCompletion(spark,
      SRuntime.slidingCounts(SRuntime.eventsStream(spark, Sf0001)), "t_sliding")
    val batch = graft.queries.StreamingQs.slidingBatchForm(spark, Sf0001)
    val got = stream.collect().map(_.toSeq).toSet
    val exp = batch.collect().map(_.toSeq).toSet
    assert(got.nonEmpty)
    assert(got == exp,
      s"missing=${(exp -- got).take(3)} extra=${(got -- exp).take(3)}")
  }

  test("gate forms: append-mode tumbling/sliding streams == batch forms") {
    // The graded keys run append-mode streams with flush sentinels; the
    // sentinel-drop step (event_type filter / max-ts cutoff) must leave
    // exactly the batch answer — no real window lost to the watermark, no
    // flush window leaking through.
    val qs = graft.queries.StreamingQs
    for ((gate, batch, name) <- Seq(
        (qs.qStreamTumbling, qs.tumblingBatchForm, "tumbling"),
        (qs.qStreamSliding, qs.slidingBatchForm, "sliding"),
        (qs.qStreamJoin, qs.joinBatchForm, "join-split-replay"))) {
      val got = gate(spark, Sf0001).collect().map(_.toSeq).toSet
      val exp = batch(spark, Sf0001).collect().map(_.toSeq).toSet
      assert(got.nonEmpty, name)
      assert(got == exp,
        s"$name: missing=${(exp -- got).take(3)} extra=${(got -- exp).take(3)}")
    }
  }

  test("late rows beyond the watermark are dropped in append mode") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import org.apache.spark.sql.functions._
    Tables.prep(spark)
    val raw = Tables.events(spark, Sf0001) // ts normalized to TimestampType
    val minUs = raw.agg(min(unix_micros(col("ts")))).collect()(0).getLong(0)
    val cutoffUs = minUs + 2L * 24 * 3600 * 1000000L // min + 2 days
    val cutoff = timestamp_micros(lit(cutoffUs))

    val watch = Paths.get(sys.props("java.io.tmpdir"), "graft-late-test")
    if (Files.exists(watch)) {
      Files.walk(watch).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    Files.createDirectories(watch)
    def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = Paths.get(sys.props("java.io.tmpdir"), s"graft-late-stage-$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val dest = watch.resolve(s"$name.parquet")
      Files.copy(part, dest, StandardCopyOption.REPLACE_EXISTING)
      dest.toFile.setLastModified(mtime)
    }
    val checkpoint = Paths.get(sys.props("java.io.tmpdir"), "graft-late-ckpt")
    val sink = Paths.get(sys.props("java.io.tmpdir"), "graft-late-sink")
    Seq(checkpoint, sink).foreach { d =>
      if (Files.exists(d)) {
        Files.walk(d).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.delete(p))
      }
    }
    // The memory sink cannot recover from a checkpoint; the parquet file
    // sink can — which is also the production shape (append to a table).
    def runOnce() = {
      val stream = Tables.decodeEventTs(
        spark.readStream.schema(raw.schema).parquet(watch.toString))
      val agg = stream.withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("w_start"), col("event_type"), col("n"))
      val q = agg.writeStream.format("parquet")
        .option("path", sink.toString)
        .outputMode("append")
        .option("checkpointLocation", checkpoint.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(120000L)
      q
    }
    def emitted(): Array[(java.sql.Timestamp, String, Long)] =
      spark.read.parquet(sink.toString).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))

    // Run 1: only the on-time file exists → watermark advances to
    // (max on-time ts − 1h), persisted in the checkpoint.
    stage(raw.filter(col("ts") >= cutoff), "b1_ontime", System.currentTimeMillis())
    runOnce()
    val onTime = emitted()
    assert(onTime.nonEmpty, "run 1 emitted nothing")

    // Run 2: only the LATE file is new (2 days of events far older than
    // the persisted watermark) → every row must be dropped.
    stage(raw.filter(col("ts") < cutoff), "b2_late", System.currentTimeMillis())
    val q2 = runOnce()
    // Late input reaches the stateful operator pre-aggregated map-side, so
    // the drop counter counts (window, type) partial groups — bounded by
    // [distinct groups, raw rows]; zero would mean late data got in.
    val lateRows = raw.filter(col("ts") < cutoff).count()
    val lateGroups = raw.filter(col("ts") < cutoff)
      .select(window(col("ts"), "1 hour"), col("event_type")).distinct().count()
    val dropped = q2.recentProgress
      .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
    assert(dropped >= lateGroups && dropped <= lateRows,
      s"watermark dropped $dropped, expected within [$lateGroups, $lateRows]")
    val cutoffMs = cutoffUs / 1000L
    val emitted2 = emitted()
    assert(emitted2.forall(_._1.getTime >= cutoffMs - 3600 * 1000),
      s"late windows emitted: ${emitted2.filter(_._1.getTime < cutoffMs - 3600 * 1000).take(3).mkString(",")}")

    // The on-time emission equals the batch aggregation over the on-time
    // subset alone (late rows contributed nothing anywhere).
    val batch = raw.filter(col("ts") >= cutoff)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    (onTime ++ emitted2).foreach { case (w, t, n) =>
      assert(batch.get((w, t)).contains(n), s"window ($w,$t): stream=$n batch=${batch.get((w, t))}")
    }
  }

  private def freshDir(name: String): java.nio.file.Path = {
    import java.nio.file.{Files, Paths}
    val d = Paths.get(sys.props("java.io.tmpdir"), name)
    if (Files.exists(d)) {
      Files.walk(d).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    d
  }

  test("foreachBatch -> partitioned parquet sink (stateless append): disk == batch") {
    import org.apache.spark.sql.functions._
    val sink = freshDir("graft-fb-etl-sink")
    val ckpt = freshDir("graft-fb-etl-ckpt")
    // Streaming ETL ingest: decode + project + filter, no state. Every
    // micro-batch appends its rows into the event_type-partitioned layout.
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("value") >= 0)
      .select(col("event_id"), col("event_type"), col("user_id"), col("value"))
    SRuntime.runToPartitionedParquet(
      shape(SRuntime.eventsStream(spark, Sf0001)),
      sink.toString, ckpt.toString, partitionCol = "event_type",
      outputMode = "append", saveMode = org.apache.spark.sql.SaveMode.Append)
    val batch = shape(Tables.events(spark, Sf0001))
    val got = graft.sources.Layout.readPartitioned(spark, sink.toString)
      .select("event_id", "event_type", "user_id", "value")
      .collect().map(_.toSeq).toSet
    val exp = batch.collect().map(_.toSeq).toSet
    assert(got.nonEmpty)
    assert(got == exp,
      s"missing=${(exp -- got).take(3)} extra=${(got -- exp).take(3)}")
    // The sink really is a hive-style partitioned layout (pruning-ready).
    val dirs = java.nio.file.Files.list(sink).iterator()
    val partDirs = Iterator.continually(dirs).takeWhile(_.hasNext).map(_.next())
      .map(_.getFileName.toString).filter(_.startsWith("event_type=")).toList
    assert(partDirs.nonEmpty, "no event_type= partition directories on disk")
  }

  test("foreachBatch -> partitioned parquet sink (complete overwrite agg): disk == batch") {
    val sink = freshDir("graft-fb-agg-sink")
    val ckpt = freshDir("graft-fb-agg-ckpt")
    // Stateful rollup: complete-mode tumbling counts; every micro-batch
    // overwrites the directory with the latest full aggregate, so the final
    // on-disk state equals the batch aggregation.
    SRuntime.runToPartitionedParquet(
      SRuntime.tumblingCounts(SRuntime.eventsStream(spark, Sf0001)),
      sink.toString, ckpt.toString, partitionCol = "event_type",
      outputMode = "complete", saveMode = org.apache.spark.sql.SaveMode.Overwrite)
    val batch = graft.queries.StreamingQs.tumblingBatchForm(spark, Sf0001)
    val cols = Seq("w_start", "event_type", "n", "sum_value")
    val got = graft.sources.Layout.readPartitioned(spark, sink.toString)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    val exp = batch.select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    assert(got.nonEmpty)
    assert(got == exp,
      s"missing=${(exp -- got).take(3)} extra=${(got -- exp).take(3)}")
  }

  test("streaming ingest dedup: at-least-once redelivery -> exactly-once output") {
    import org.apache.spark.sql.functions._
    // Source replays the whole events file TWICE (two micro-batches); the
    // watermark dedup must emit every event exactly once — redelivered rows
    // are either dropped as duplicates (state alive) or as late data
    // (behind the watermark), and both paths land on the batch answer.
    val stream = SRuntime.runToCompletionAppend(spark,
      SRuntime.dedupedEvents(SRuntime.eventsStreamWithRedelivery(spark, Sf0001)),
      "t_dedup_stream")
    val got = stream.select("event_id").collect().map(_.getLong(0)).toSeq
    val exp = Tables.events(spark, Sf0001)
      .select("event_id").collect().map(_.getLong(0)).toSeq
    assert(got.size == got.distinct.size, "stream emitted a duplicate event_id")
    assert(got.toSet == exp.toSet,
      s"missing=${(exp.toSet -- got.toSet).take(3)} extra=${(got.toSet -- exp.toSet).take(3)}")
  }

  test("streaming CONTENT dedup: redelivered documents -> exactly-once per (source, text)") {
    import org.apache.spark.sql.functions._
    val got = graft.queries.StreamingQs.qStreamDedupContent(spark, Sf0001)
      .collect().map(_.toSeq).toSet
    val exp = Tables.documents(spark, Sf0001)
      .select(col("source"), md5(col("text")).as("h"), col("n_chars")).distinct()
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_unique"), sum(col("n_chars")).as("sum_chars"))
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty && got == exp,
      s"missing=${(exp -- got).take(3)} extra=${(got -- exp).take(3)}")
  }

  test("stream-stream interval join: stream result == batch result") {
    // Single-batch replay (both sides arrive together); the gate key runs
    // the time-split replay, pinned in the gate-forms test below.
    val stream = SRuntime.runToCompletionAppend(spark,
      SRuntime.clickPurchaseJoin(SRuntime.eventsStream(spark, Sf0001)), "t_ssjoin")
    val batch = graft.queries.StreamingQs.joinBatchForm(spark, Sf0001)
    val got = stream.collect().map(_.toSeq).toSet
    val exp = batch.collect().map(_.toSeq).toSet
    assert(got.nonEmpty, "interval join should emit pairs on this corpus")
    assert(got == exp,
      s"missing=${(exp -- got).take(3)} extra=${(got -- exp).take(3)}")
  }

  test("left-outer stream-stream join: null rows exactly complement the inner matches") {
    import org.apache.spark.sql.functions._
    // Partition identity over the time-split replay: matched outer rows ==
    // the inner join's pair set, and the null rows are exactly the clicks
    // the inner join never matched — no phantom null beside a real match,
    // no unmatched click lost in state (the watermark-sentinel claim).
    val outer = SRuntime.runToCompletionAppend(spark,
      SRuntime.clickPurchaseJoinOuter(SRuntime.eventsStreamSplitByTime(spark, Sf0001)),
      "t_ssjoin_outer")
    val inner = SRuntime.runToCompletionAppend(spark,
      SRuntime.clickPurchaseJoin(SRuntime.eventsStreamSplitByTime(spark, Sf0001)),
      "t_ssjoin_inner")
    val matchedOuter = outer.filter(col("purchase_id").isNotNull)
      .select("click_id", "purchase_id").collect().map(_.toSeq).toSet
    val innerPairs = inner.select("click_id", "purchase_id")
      .collect().map(_.toSeq).toSet
    assert(matchedOuter == innerPairs,
      s"matched-row mismatch: missing=${(innerPairs -- matchedOuter).take(3)} " +
        s"extra=${(matchedOuter -- innerPairs).take(3)}")
    val nullClicks = outer.filter(col("purchase_id").isNull)
      .select("click_id").collect().map(_.getLong(0)).toSet
    val matchedClicks = innerPairs.map(_.head.asInstanceOf[Long])
    val allClicks = Tables.events(spark, Sf0001)
      .filter(col("event_type") === "click")
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    assert(nullClicks == (allClicks -- matchedClicks),
      s"null-proof set wrong: missing=${((allClicks -- matchedClicks) -- nullClicks).take(5)} " +
        s"phantom=${(nullClicks -- (allClicks -- matchedClicks)).take(5)}")
    assert(!nullClicks.contains(-1L), "flush sentinel leaked into the output")
  }

  test("full-outer stream-stream join: BOTH sides' null rows complement the matches; no null proof before watermark passage") {
    import org.apache.spark.sql.functions._
    val full = SRuntime.runToCompletionAppend(spark,
      SRuntime.clickPurchaseJoinFull(SRuntime.eventsStreamSplitByTime(spark, Sf0001)),
      "t_ssjoin_full")
      .filter(coalesce(col("click_id"), lit(0L)) >= 0 &&
        coalesce(col("purchase_id"), lit(0L)) >= 0)
    val inner = SRuntime.runToCompletionAppend(spark,
      SRuntime.clickPurchaseJoin(SRuntime.eventsStreamSplitByTime(spark, Sf0001)),
      "t_ssjoin_inner_for_full")
    val matched = full.filter(col("click_id").isNotNull && col("purchase_id").isNotNull)
      .select("click_id", "purchase_id").collect().map(_.toSeq).toSet
    val innerPairs = inner.select("click_id", "purchase_id")
      .collect().map(_.toSeq).toSet
    assert(matched == innerPairs,
      s"matched-row mismatch: missing=${(innerPairs -- matched).take(3)} " +
        s"extra=${(matched -- innerPairs).take(3)}")
    // Each side's null set is exactly its unmatched complement — no phantom
    // null beside a real match, nothing stranded in state on either side.
    val ev = Tables.events(spark, Sf0001)
    val allClicks = ev.filter(col("event_type") === "click")
      .select("event_id").collect().map(_.getLong(0)).toSet
    val allPurchases = ev.filter(col("event_type") === "purchase")
      .select("event_id").collect().map(_.getLong(0)).toSet
    val nullClicks = full.filter(col("purchase_id").isNull)
      .select("click_id").collect().map(_.getLong(0)).toSet
    val nullPurchases = full.filter(col("click_id").isNull)
      .select("purchase_id").collect().map(_.getLong(0)).toSet
    val matchedClicks = innerPairs.map(_.head.asInstanceOf[Long])
    val matchedPurchases = innerPairs.map(_(1).asInstanceOf[Long])
    assert(nullClicks == (allClicks -- matchedClicks), "unmatched-click set wrong")
    assert(nullPurchases == (allPurchases -- matchedPurchases),
      s"unmatched-purchase set wrong: missing=${((allPurchases -- matchedPurchases) -- nullPurchases).take(5)} " +
        s"phantom=${(nullPurchases -- (allPurchases -- matchedPurchases)).take(5)}")
    assert(nullClicks.nonEmpty && nullPurchases.nonEmpty,
      "corpus must exercise both null directions")
    // Null proofs are watermark-FINALIZED: micro-batch 0 runs against
    // watermark 0, so no null-sided row may emit there — a per-batch probe
    // via foreachBatch pins the wait.
    val nullRowsPerBatch = scala.collection.mutable.Map[Long, Long]()
    val q = SRuntime.clickPurchaseJoinFull(SRuntime.eventsStreamSplitByTime(spark, Sf0001))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        val n = b.filter(col("click_id").isNull || col("purchase_id").isNull).count()
        nullRowsPerBatch.synchronized { nullRowsPerBatch(id) = n }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000L), "per-batch probe stream timed out")
    assert(nullRowsPerBatch.getOrElse(0L, 0L) == 0L,
      s"null proof emitted in batch 0, before any watermark passage: $nullRowsPerBatch")
    assert(nullRowsPerBatch.values.sum > 0L,
      s"no null proofs emitted at all: $nullRowsPerBatch")
  }

  test("right-outer stream-stream join == full-outer minus the unmatched-click rows") {
    import org.apache.spark.sql.functions._
    // Family consistency law, both sides run as REAL streams: right outer
    // is exactly the full-outer result with the null-purchase (unmatched
    // click) rows removed.
    val right = SRuntime.runToCompletionAppend(spark,
      SRuntime.clickPurchaseJoinRight(SRuntime.eventsStreamSplitByTime(spark, Sf0001)),
      "t_ssjoin_right")
      .filter(coalesce(col("click_id"), lit(0L)) >= 0 &&
        coalesce(col("purchase_id"), lit(0L)) >= 0)
      .collect().map(_.toSeq).toSet
    val full = SRuntime.runToCompletionAppend(spark,
      SRuntime.clickPurchaseJoinFull(SRuntime.eventsStreamSplitByTime(spark, Sf0001)),
      "t_ssjoin_full_for_right")
      .filter(coalesce(col("click_id"), lit(0L)) >= 0 &&
        coalesce(col("purchase_id"), lit(0L)) >= 0)
    val expected = full.filter(col("purchase_id").isNotNull)
      .collect().map(_.toSeq).toSet
    assert(right.nonEmpty && right == expected,
      s"missing=${(expected -- right).take(3)} extra=${(right -- expected).take(3)}")
    assert(right.exists(_(1) == null), "no null-click proof emitted")
  }

  test("update-mode serving: mid-stream snapshot differs from final, re-emitted keys changed value, final == batch aggregate") {
    import org.apache.spark.sql.functions._
    val root = Tables.stageDir(spark, "t-upd-serving")
    val ckpt = Tables.stageDir(spark, "t-upd-serving-ckpt")
    Tables.deleteRecursively(root); Tables.deleteRecursively(ckpt)
    SRuntime.runUpdateServing(
      SRuntime.eventsStreamSplitByTime(spark, Sf0001)
        .filter(col("event_type") =!= "flush")
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("n"),
          graft.functions.Det.dsum(col("value"), 6).as("sum_value")),
      root, ckpt, keyCols = Seq("event_type", "user_id"))
    val versions = {
      import scala.jdk.CollectionConverters._
      val l = java.nio.file.Files.list(java.nio.file.Paths.get(root))
      try l.iterator().asScala.map(_.getFileName.toString)
        .filter(_.matches("v\\d{5}")).toSeq.sorted
      finally l.close()
    }
    assert(versions.size >= 2, s"need >=2 ticks to exercise update mode: $versions")
    assert(SRuntime.latestServingVersion(root).contains(versions.last))
    val first = spark.read.parquet(s"$root/${versions.head}")
    val last = spark.read.parquet(s"$root/${versions.last}")
    // Update mode EXERCISED: the mid-stream snapshot is not the final one,
    // and some key was re-emitted with a CHANGED aggregate (not merely
    // appended) — the exact behavior append mode cannot produce.
    val firstRows = first.collect().map(_.toSeq).toSet
    val lastRows = last.collect().map(_.toSeq).toSet
    assert(firstRows != lastRows, "mid-stream snapshot == final: update mode not exercised")
    val changed = first.as("a").join(last.as("b"), Seq("event_type", "user_id"))
      .filter(col("a.n") =!= col("b.n")).count()
    assert(changed > 0, "no key re-emitted with a changed value across ticks")
    // Convergence law: latest-wins over re-emissions == from-scratch batch.
    val batchAgg = Tables.events(spark, Sf0001)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        graft.functions.Det.dsum(col("value"), 6).as("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(lastRows == batchAgg,
      s"serving table diverged from batch: missing=${(batchAgg -- lastRows).take(3)} " +
        s"extra=${(lastRows -- batchAgg).take(3)}")
  }

  test("flatMapGroupsWithState sessions == session_window batch result") {
    import org.apache.spark.sql.functions._
    // The custom state machine (incl. its event-time-timeout emission path,
    // exercised via the flush batches) must agree with the declarative
    // session_window aggregation on every (user, start, end, count).
    val stream = SRuntime.runToCompletionAppend(spark,
      SRuntime.statefulSessions(SRuntime.eventsStreamWithFlush(spark, Sf0001)),
      "t_stateful")
    val batch = Tables.events(spark, Sf0001)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start"), col("sw.end"), col("n_events"))
    val got = stream.select("user_id", "s_start", "s_end", "n_events")
      .collect().map(_.toSeq).toSet
    val exp = batch.collect().map(_.toSeq).toSet
    assert(got.nonEmpty)
    assert(got == exp,
      s"missing=${(exp -- got).take(3)} extra=${(got -- exp).take(3)}")
  }

  test("transformWithState sessions (v2 API) == flatMapGroupsWithState sessions, decimal sums included") {
    // The v2 processor (named state variables + explicit timers, RocksDB
    // required) must be row-identical to the v1 fold — including the
    // Det.dsum-parity decimal sum, which the session_window cross-check
    // above does not cover. Split replay: the timer-delete/re-register
    // path only matters across micro-batches.
    val v1 = SRuntime.runToCompletionAppend(spark,
      SRuntime.statefulSessions(SRuntime.eventsStreamSplitByTime(spark, Sf0001)),
      "t_stateful_v1_cmp").collect().map(_.toSeq).toSet
    val v2 = SRuntime.runToCompletionAppend(spark,
      SRuntime.statefulSessionsV2(SRuntime.eventsStreamSplitByTime(spark, Sf0001)),
      "t_stateful_v2_cmp").collect().map(_.toSeq).toSet
    assert(v2.nonEmpty)
    assert(v1 == v2,
      s"missing=${(v1 -- v2).take(3)} extra=${(v2 -- v1).take(3)}")
  }

  test("RocksDB is the active state backend: checkpoint state dir carries RocksDB artifacts; recovery crosses it") {
    // The provider swap must be OBSERVABLE, not assumed: after the
    // stop/restart run (whose recovery therefore crossed a RocksDB
    // snapshot/changelog reload), the checkpoint's state directory must
    // hold RocksDB's on-disk format — .changelog deltas (changelog
    // checkpointing is on) and/or .zip snapshots — not the HDFS-backed
    // provider's bare .delta files.
    SRuntime.runTumblingWithRestart(spark, Sf0001)
    val ckpt = java.nio.file.Paths.get(
      Tables.stageDir(spark, "stream-restart-ckpt", Sf0001), "state")
    assert(java.nio.file.Files.exists(ckpt), s"no state dir under $ckpt")
    val files = {
      import scala.jdk.CollectionConverters._
      val w = java.nio.file.Files.walk(ckpt)
      try w.iterator().asScala.map(_.getFileName.toString).toVector
      finally w.close()
    }
    assert(files.exists(n => n.endsWith(".changelog") || n.endsWith(".zip")),
      s"no RocksDB artifacts under $ckpt — backend swap did not take " +
      s"(sample: ${files.take(8)})")
    assert(!files.exists(_.endsWith(".delta")),
      "HDFS-backed provider .delta files present — two backends mixed in one checkpoint")
  }

  test("stateful sessions across a time-split replay (cross-batch state merge)") {
    import org.apache.spark.sql.functions._
    // Real data arrives in TWO micro-batches split at the median timestamp:
    // sessions open at the end of batch 1 must be extended by batch 2's
    // rows or emitted via timeout — the cross-batch state machine, not the
    // everything-in-one-flatMap-call degenerate case.
    val stream = SRuntime.runToCompletionAppend(spark,
      SRuntime.statefulSessions(SRuntime.eventsStreamSplitByTime(spark, Sf0001)),
      "t_stateful_split")
    val batch = Tables.events(spark, Sf0001)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start"), col("sw.end"), col("n_events"))
    val got = stream.select("user_id", "s_start", "s_end", "n_events")
      .collect().map(_.toSeq).toSet
    val exp = batch.collect().map(_.toSeq).toSet
    assert(got.nonEmpty)
    assert(got == exp,
      s"missing=${(exp -- got).take(3)} extra=${(got -- exp).take(3)}")
  }

  test("session window: stream result == batch result") {
    // The gate key itself now runs the append-mode stream; this test keeps
    // the complete-mode runtime pinned against the declared batch form.
    val stream = SRuntime.runToCompletion(spark,
      SRuntime.sessionCounts(SRuntime.eventsStream(spark, Sf0001)), "t_session")
    val batch = graft.queries.StreamingQs.sessionBatchForm(spark, Sf0001)
    val got = stream.collect().map(_.toSeq).toSet
    val exp = batch.collect().map(_.toSeq).toSet
    assert(got.nonEmpty)
    assert(got == exp,
      s"missing=${(exp -- got).take(3)} extra=${(got -- exp).take(3)}")
  }

  test("events fixture invariant: event_id unique (q_stream_dedup oracle dependency)") {
    // q_stream_dedup's oracle is the plain per-type aggregate over the
    // SOURCE table, which equals the deduped stream only because event_id
    // is unique in the fixture. Check the invariant instead of assuming it,
    // at both the spec SF and the graded SF — a regenerated testdata set
    // with duplicate ids should fail HERE, not as an opaque hash mismatch.
    for (sf <- Seq(Sf0001, Sf001)) {
      val ev = Tables.events(spark, sf).select("event_id")
      val (total, distinct) = (ev.count(), ev.distinct().count())
      assert(total == distinct,
        s"$sf: ${total - distinct} duplicate event_ids break the dedup oracle")
    }
  }

  test("q_stream_late: the ledger balances — accepted + dropped == every event, drops nonzero") {
    // The late-accounting contract's conservation law: every source row is
    // either in the accepted aggregate or on the dropped ledger; none
    // vanish unaccounted. And the schedule must actually plant late rows —
    // a zero drop count would make the whole key vacuous.
    val rows = SparkEntry.queries("q_stream_late")(spark, Sf0001).collect()
    val dropped = rows.head.getAs[Long]("n_late_dropped")
    val accepted = rows.map(_.getAs[Long]("n_accepted")).sum
    assert(rows.map(_.getAs[Long]("n_late_dropped")).distinct.length == 1,
      "audit column must be constant across rows")
    assert(dropped > 0, "replay schedule planted no late rows")
    assert(accepted + dropped == Tables.events(spark, Sf0001).count(),
      s"ledger imbalance: accepted=$accepted dropped=$dropped")
  }

  test("rollup maintenance: one partial row set per tick; merged == from-scratch") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q_stream_view_maintain")(spark, Sf0001)
      .collect().map(_.toSeq).toSeq
    // The stored rollup itself: the split replay delivers two data
    // micro-batches → exactly two tick generations of partials.
    val rollup = spark.read.parquet(
      Tables.stageDir(spark, "stream-rollup", Sf0001))
    val ticks = rollup.select(col("tick")).distinct().collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(ticks.length == 2, s"expected 2 tick generations, got $ticks")
    // Merged partials == from-scratch aggregate over the source.
    val exp = Tables.events(spark, Sf0001)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.functions.Det.dsum(col("value"), 6).as("sum_value"))
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(got == exp, "tick-partial accretion diverges from full recompute")
  }

  test("checkpoint restart: resumed == uninterrupted, offsets resumed, no duplicate epochs") {
    // The exactly-once-across-restart proof behind q_stream_restart: stop
    // the tumbling stream after the early half, restart from the SAME
    // checkpoint once the late half arrives.
    val (resumedSink, runs, lateRows) =
      SRuntime.runTumblingWithRestart(spark, Sf0001)
    // (1) Source-offset recovery: the restarted run read EXACTLY the newly
    // arrived file — neither zero rows (stuck) nor early+late (reprocessed).
    assert(runs.length == 2, s"expected 2 runs, got $runs")
    assert(runs(0) > 0, "first run processed nothing")
    assert(runs(1) == lateRows,
      s"restarted run read ${runs(1)} rows, expected the late file's $lateRows")
    // (2) Recovery invisible in results: resumed ≡ uninterrupted.
    val resumed = resumedSink.collect().map(_.toSeq).toSet
    val (unSink, unRuns, _) =
      SRuntime.runTumblingWithRestart(spark, Sf0001, interrupted = false)
    assert(unRuns.length == 1)
    val un = unSink.collect().map(_.toSeq).toSet
    assert(resumed.nonEmpty)
    assert(resumed == un,
      s"missing=${(un -- resumed).take(3)} extra=${(resumed -- un).take(3)}")
    // (3) No duplicate epochs: a re-committed batch would double-append its
    // windows — every (w_start, event_type) must appear exactly once.
    assert(resumedSink.count() ==
      resumedSink.select("w_start", "event_type").distinct().count(),
      "append sink holds duplicate window rows — a batch committed twice")
  }

  test("complete mode: mid-stream snapshot differs from final and is a prefix; final == batch aggregate") {
    import org.apache.spark.sql.functions._
    import graft.functions.Det.dsum
    // The output-mode family's third member (q_stream_complete): ONE query
    // over the two-arrival split replay; the memory sink is truncated and
    // rewritten with the FULL aggregate each micro-batch.
    val (fin, mid) = SRuntime.runCompleteWithSnapshot(spark, Sf0001,
      df => df.filter(col("event_type") =!= "flush")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("sum_value")),
      "t_complete")
    val finRows = fin.collect().map(_.toSeq).toSet
    val midRows = mid.map(_.toSeq).toSet
    // (1) Complete mode actually exercised across two micro-batches: the
    // mid-stream snapshot is a nonempty, strictly-smaller-count prefix.
    assert(midRows.nonEmpty, "mid-stream snapshot empty — batch 1 emitted nothing")
    assert(midRows != finRows,
      "mid-stream snapshot equals final — the stream collapsed to one batch")
    val midN = mid.map(r => r.getString(0) -> r.getLong(1)).toMap
    val finN = fin.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(midN.forall { case (t, n) => finN.get(t).exists(_ >= n) },
      "a per-type count shrank between snapshots — the sink kept stale rows")
    assert(midN.values.sum < finN.values.sum,
      "total count did not grow — batch 2 contributed nothing")
    // (2) The final snapshot IS the batch aggregate over the full replay.
    val batch = graft.Tables.events(spark, Sf0001)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(finRows == batch,
      s"missing=${(batch -- finRows).take(3)} extra=${(finRows -- batch).take(3)}")
  }

  test("stream-static join: stream == batch twin; unmatched users land in UNKNOWN; flush never surfaces") {
    import org.apache.spark.sql.functions._
    val dim = graft.Tables.customer(spark, Sf0001)
      .filter(col("c_custkey") < 10L)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val got = SparkEntry.queries("q_stream_join_static")(spark, Sf0001)
      .collect().map(_.toSeq).toSet
    val batch = graft.Tables.events(spark, Sf0001)
      .join(dim, Seq("user_id"), "left")
      .groupBy(date_trunc("hour", col("ts")).as("w_start"),
        coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))
      .agg(count(lit(1)).as("n"), graft.functions.Det.dsum(col("value"), 6).as("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty && got == batch,
      s"missing=${(batch -- got).take(3)} extra=${(got -- batch).take(3)}")
    // user_id 10..14 exists at sf0.001 and the dim stops at 9, so the UNKNOWN bucket must be populated; the flush sentinel's
    // segment must have been filtered out.
    val segs = got.map(_(1).asInstanceOf[String])
    assert(segs.contains("UNKNOWN"), s"no UNKNOWN bucket in $segs")
    assert(!segs.contains("flush"))
  }

  test("streaming CDC apply: mid snapshot == applyCdc of the tick-1 slice; final == one-shot fold") {
    import org.apache.spark.sql.functions._
    val cust = graft.Tables.customer(spark, Sf0001)
    val changes = graft.queries.Relational.mergeChangeset(cust)
    // Run the graded key (it stages, streams, certifies) ...
    val fin = SparkEntry.queries("q_stream_cdc_apply")(spark, Sf0001)
      .collect().map(_.toSeq).toSet
    // ... then pin both snapshots against the batch fold semantics.
    val oneShot = graft.operators.Merge.applyCdc(cust, changes,
        "c_custkey", "seq", "op")
      .collect().map(_.toSeq).toSet
    assert(fin == oneShot,
      s"final != one-shot: missing=${(oneShot -- fin).take(3)} extra=${(fin -- oneShot).take(3)}")
    val serving = graft.Tables.stageDir(spark, "cdc-serving", Sf0001)
    val vers = {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(serving)
      val l = java.nio.file.Files.list(root)
      try l.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.matches("v\\d{5,}") &&
          java.nio.file.Files.exists(root.resolve(n).resolve("_SUCCESS")))
        .toSeq.sorted
      finally l.close()
    }
    assert(vers.size == 2)
    val mid = spark.read.parquet(s"$serving/${vers.head}")
      .collect().map(_.toSeq).toSet
    val tick1 = graft.operators.Merge.applyCdc(cust,
        changes.filter(col("seq") === 1), "c_custkey", "seq", "op")
      .collect().map(_.toSeq).toSet
    assert(mid == tick1,
      s"mid != tick-1 fold: missing=${(tick1 -- mid).take(3)} extra=${(mid -- tick1).take(3)}")
  }

  test("corpus dedup: stream seen-set fold == batch fold over the exact pair set") {
    // q_stream_dedup_corpus's semantics re-derived IN-ENGINE from the
    // staged exact near-dup pair artifact (doc_a < doc_b): an arrival
    // (% 10 == 3) drops iff it pairs with a corpus doc (seen regardless
    // of id order) or with a SMALLER-id arrival (earlier in the replay's
    // doc_id arrival order) — survivor or not, since every arrival
    // enters the index. Stream must equal this batch fold row for row.
    import org.apache.spark.sql.functions._
    val pairs = graft.queries.LlmOps.stagedMinhashPairs(spark, Sf0001)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val dropped = (pairs.collect { case (a, b) if b % 10 == 3 => b } ++
      pairs.collect { case (a, b) if a % 10 == 3 && b % 10 != 3 => a }).toSet
    val exp = Tables.documents(spark, Sf0001)
      .filter(col("doc_id") % 10 === 3)
      .select(col("doc_id"), col("source")).collect()
      .filter(r => !dropped(r.getLong(0)))
      .map(_.toSeq).toSet
    val got = SRuntime.runCorpusDedup(spark, Sf0001)
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty)
    assert(got == exp,
      s"missing=${(exp -- got).take(3)} extra=${(got -- exp).take(3)}")
  }
}
