package graft

import graft.operators.Merge
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** operators/Merge.applyCdc semantics: every MERGE INTO arm, latest-wins
  * independence from arrival order, and the plan claim — a small changeset
  * must never force a shuffle of the base snapshot. */
class MergeSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "name", "v")

  // Arrival order deliberately scrambled (seq 2 before seq 1, delete first):
  // latest-wins must come from seq, not from input position.
  private def changes = Seq(
    (2L, 1, "D", null.asInstanceOf[String], 0.0),
    (1L, 2, "U", "a2", 12.0),
    (1L, 1, "U", "a1", 11.0),
    (9L, 5, "D", null.asInstanceOf[String], 0.0), // delete-absent: no-op
    (4L, 1, "U", "d", 40.0) // insert-absent
  ).toDF("k", "seq", "op", "name", "v")

  test("applyCdc: update latest-wins, delete, insert, delete-absent no-op") {
    val got = Merge.applyCdc(base, changes, "k", "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "a2", 12.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("applyCdc output columns and types equal the base's") {
    // Nullability may relax (when/otherwise over an outer join); names and
    // types must hold exactly.
    val out = Merge.applyCdc(base, changes, "k", "seq", "op")
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      base.schema.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("a small changeset never shuffles the base snapshot") {
    val parquetBase = {
      val dir = java.nio.file.Files.createTempDirectory("merge-base").toString
      Tables.documents(spark, SparkFixture.Sf0001)
        .select(col("doc_id").as("k"), col("lang").as("name"),
          col("n_chars").cast("double").as("v"))
        .write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    }
    val df = Merge.applyCdc(parquetBase, changes, "k", "seq", "op")
    val plan = PlanCheck.finalPlan(df)
    // The changeset's latest-per-key agg may shuffle (it is tiny); an
    // exchange with the base's FILE SCAN beneath it is the scale defect
    // this operator exists to avoid — assert there is none. (And assert the
    // scan is actually IN the plan, so this can't pass vacuously.)
    import org.apache.spark.sql.execution.FileSourceScanExec
    def scansBase(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      PlanCheck.flatten(p).exists(_.isInstanceOf[FileSourceScanExec])
    assert(scansBase(plan), s"expected the parquet base scan in:\n$plan")
    val baseShuffles = PlanCheck.flatten(plan).count {
      case e: ShuffleExchangeLike => scansBase(e)
      case _ => false
    }
    assert(baseShuffles == 0, s"base snapshot was shuffled:\n$plan")
  }

  test("changeFeed: insert/update/delete classification with pre- and post-images") {
    val feed = Merge.changeFeed(base, changes, "k", "seq", "op")
    assert(feed.columns.toSeq ==
      Seq("k", "change_type", "old_name", "old_v", "new_name", "new_v"))
    val rows = feed.collect().map(r => (r.getLong(0), r.getString(1),
      Option(r.get(2)), Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))).toSet
    // delete-absent (k=9) emits nothing; latest-wins picks seq 2 for k=1.
    assert(rows == Set(
      (1L, "update", Some("a"), Some(10.0), Some("a2"), Some(12.0)),
      (2L, "delete", Some("b"), Some(20.0), None, None),
      (4L, "insert", None, None, Some("d"), Some(40.0))),
      s"unexpected feed: $rows")
  }

  test("changeFeed is consistent with applyCdc: base + feed replays to the merged snapshot") {
    import org.apache.spark.sql.functions._
    val feed = Merge.changeFeed(base, changes, "k", "seq", "op")
    // Replay the feed against the base the way a downstream consumer
    // would: drop updated/deleted keys, add post-images of non-deletes.
    val touched = feed.select(col("k"))
    val replayed = base.join(touched, Seq("k"), "left_anti")
      .unionByName(feed.filter(col("change_type") =!= "delete")
        .select(col("k"), col("new_name").as("name"), col("new_v").as("v")))
    val viaApply = Merge.applyCdc(base, changes, "k", "seq", "op")
    assert(replayed.collect().map(_.toSeq).toSet ==
      viaApply.collect().map(_.toSeq).toSet,
      "feed replay diverges from the applyCdc fold")
  }

  test("changeFeed never shuffles the base snapshot below the gate") {
    val parquetBase = {
      val dir = java.nio.file.Files.createTempDirectory("merge-feed-base").toString
      Tables.documents(spark, SparkFixture.Sf0001)
        .select(col("doc_id").as("k"), col("lang").as("name"),
          col("n_chars").cast("double").as("v"))
        .write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    }
    val df = Merge.changeFeed(parquetBase, changes, "k", "seq", "op")
    val plan = PlanCheck.finalPlan(df)
    import org.apache.spark.sql.execution.FileSourceScanExec
    def scansBase(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      PlanCheck.flatten(p).exists(_.isInstanceOf[FileSourceScanExec])
    assert(scansBase(plan), s"expected the parquet base scan in:\n$plan")
    val baseShuffles = PlanCheck.flatten(plan).count {
      case e: ShuffleExchangeLike => scansBase(e)
      case _ => false
    }
    assert(baseShuffles == 0, s"base snapshot was shuffled:\n$plan")
  }

  test("above the broadcast gate, a BUCKETED base still exchanges nothing") {
    // The Merge.scala claim composed end-to-end: with the broadcast gate
    // forced OFF (broadcastGateBytes = 0 — what a corpus-sized changeset
    // does organically), a base laid out with Layout.writeBucketed on the
    // merge key joins from its bucket layout — only the changeset side may
    // exchange. This is the 100 TB shape: base scan → zero exchanges, CDC
    // trickle → tiny shuffles.
    import org.apache.spark.sql.execution.FileSourceScanExec
    val path = sys.props("java.io.tmpdir") + "/graft-merge-bucketed-base"
    graft.sources.Layout.writeBucketed(
      Tables.documents(spark, SparkFixture.Sf0001)
        .select(col("doc_id").as("k"), col("lang").as("name"),
          col("n_chars").cast("double").as("v")),
      "merge_bucketed_base", path, "k", 8)
    val base = spark.table("merge_bucketed_base")
    val df = Merge.applyCdc(base, changes, "k", "seq", "op",
      broadcastGateBytes = 0L)
    // Same rows as the gated-broadcast path over the same base.
    val viaBroadcast = Merge.applyCdc(base, changes, "k", "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val got = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == viaBroadcast)
    val plan = PlanCheck.finalPlan(df)
    def scansBase(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      PlanCheck.flatten(p).exists {
        case s: FileSourceScanExec => s.relation.bucketSpec.isDefined
        case _ => false
      }
    assert(scansBase(plan), s"expected the bucketed base scan in:\n$plan")
    val baseShuffles = PlanCheck.flatten(plan).count {
      case e: ShuffleExchangeLike => scansBase(e)
      case _ => false
    }
    assert(baseShuffles == 0,
      s"bucketed base was exchanged above the gate:\n$plan")
  }
}
