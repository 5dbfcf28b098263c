package graft.streaming

import org.apache.spark.api.java.Optional

import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.SparkTestSession
import graft.streaming.TransitionStream.{Ev, LastEv, Trans}

/** Pins q213's stateful core with Spark's TestGroupState harness: the
  * cross-micro-batch boundary transition must emit EXACTLY once (from
  * the carried last-event state to the next batch's first event), and
  * within-batch events must sort by (us, event_id) before pairing —
  * the two places a streaming transition miner can silently diverge
  * from the batch lead() semantics.
  */
class TransitionStreamSpec extends AnyFunSuite {

  private def freshState(init: Option[LastEv]): TestGroupState[LastEv] =
    TestGroupState.create[LastEv](
      init.map(Optional.of[LastEv]).getOrElse(Optional.empty[LastEv]()),
      GroupStateTimeout.NoTimeout, 0L, Optional.empty[Long](), false)

  test("within-batch events pair in (us, event_id) order, not arrival order") {
    val st = freshState(None)
    // arrival order scrambled; a ts tie broken by event_id
    val evs = Iterator(
      Ev(1L, 12L, 300L, "c"), Ev(1L, 10L, 100L, "a"),
      Ev(1L, 13L, 100L, "b") // same us as event 10 → event_id orders a before b? 10 < 13 so a first
    )
    val out = TransitionStream.update(1L, evs, st).toSeq
    assert(out === Seq(Trans("a", "b"), Trans("b", "c")))
    assert(st.get === LastEv(300L, 12L, "c"))
  }

  test("cross-batch boundary transition emits exactly once from carried state") {
    // batch 1
    val st1 = freshState(None)
    val out1 = TransitionStream.update(7L,
      Iterator(Ev(7L, 1L, 10L, "x"), Ev(7L, 2L, 20L, "y")), st1).toSeq
    assert(out1 === Seq(Trans("x", "y")))
    val carried = st1.get
    assert(carried === LastEv(20L, 2L, "y"))
    // batch 2 starts from the carried state: boundary pair y->z emits here
    val st2 = freshState(Some(carried))
    val out2 = TransitionStream.update(7L,
      Iterator(Ev(7L, 3L, 30L, "z"), Ev(7L, 4L, 40L, "x")), st2).toSeq
    assert(out2 === Seq(Trans("y", "z"), Trans("z", "x")))
    assert(st2.get === LastEv(40L, 4L, "x"))
  }

  test("empty batch leaves state untouched and emits nothing") {
    val st = freshState(Some(LastEv(5L, 1L, "a")))
    val out = TransitionStream.update(9L, Iterator.empty, st).toSeq
    assert(out.isEmpty)
    // update() only calls state.update when it saw events
    assert(st.get === LastEv(5L, 1L, "a"))
  }

  test("end-to-end stream equals the batch q203 on sf0.001") {
    val spark = SparkTestSession.spark
    val got = SparkEntry.queries("q213_stream_markov")(spark, SparkTestSession.sfDir)
      .collect().toSeq.map(_.toString)
    val want = SparkEntry.queries("q203_markov_transitions")(spark, SparkTestSession.sfDir)
      .collect().toSeq.map(_.toString)
    assert(got === want)
    spark.catalog.clearCache()
  }
}
