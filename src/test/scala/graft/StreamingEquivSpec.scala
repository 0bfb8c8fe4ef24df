package graft

import graft.streaming.{Runtime => SRuntime}
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming == batch equivalence (SURVEY §5.2): the §2.10 batch
  * forms define the semantics; the same aggregations run as real incremental
  * streams over a file-replayed events source must produce identical rows. */
class StreamingEquivSpec extends AnyFunSuite {
  import SparkFixture._

  test("tumbling window: stream result == batch result") {
    val stream = SRuntime.runToCompletion(spark,
      SRuntime.tumblingCounts(SRuntime.eventsStream(spark, Sf0001)), "t_tumbling")
    val batch = SparkEntry.queries("q_stream_tumbling")(spark, Sf0001)
    val got = stream.collect().map(_.toSeq).toSet
    val exp = batch.collect().map(_.toSeq).toSet
    assert(got.nonEmpty)
    assert(got == exp,
      s"missing=${(exp -- got).take(3)} extra=${(got -- exp).take(3)}")
  }

  test("session window: stream result == batch result") {
    val stream = SRuntime.runToCompletion(spark,
      SRuntime.sessionCounts(SRuntime.eventsStream(spark, Sf0001)), "t_session")
    val batch = SparkEntry.queries("q_stream_session")(spark, Sf0001)
      .select("user_id", "s_start", "s_end", "n_events")
    val got = stream.collect().map(_.toSeq).toSet
    val exp = batch.collect().map(_.toSeq).toSet
    assert(got.nonEmpty)
    assert(got == exp,
      s"missing=${(exp -- got).take(3)} extra=${(got -- exp).take(3)}")
  }
}
