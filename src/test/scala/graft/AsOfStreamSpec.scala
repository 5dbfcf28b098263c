package graft.streaming

import org.apache.spark.api.java.Optional

import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.AsOfStream.{Dim, Enriched, Ev}

/** Pins q422's stateful core with Spark's TestGroupState harness: the
  * per-user dimension list must fold in event-time order within a
  * batch, carry across batches, stay DISTINCT-sorted under replays and
  * duplicate signups, match each purchase to the floor signup (never a
  * later one), drop purchases with no prior signup, and stay exact when
  * a signup arrives late in processing time but postdates every pending
  * purchase (the no-late-dimension contract's covered half).
  */
class AsOfStreamSpec extends AnyFunSuite {

  private def freshState(init: Option[Dim]): TestGroupState[Dim] =
    TestGroupState.create[Dim](
      init.map(Optional.of[Dim]).getOrElse(Optional.empty[Dim]()),
      GroupStateTimeout.NoTimeout, 0L, Optional.empty[Long](), false)

  private def sig(id: Long, us: Long) = Ev(1L, id, "signup", us)
  private def pur(id: Long, us: Long) = Ev(1L, id, "purchase", us)

  test("within-batch fold is event-time ordered: purchase sees the signup that precedes it") {
    val st = freshState(None)
    // arrival order scrambled: purchase first, then the two signups
    val out = AsOfStream.update(1L,
      Iterator(pur(30L, 250L), sig(10L, 100L), sig(20L, 200L)), st).toSeq
    assert(out === Seq(Enriched(1L, 30L, 250L, 200L, 50L)))
    assert(st.get === Dim(List(100L, 200L)))
  }

  test("floor match: a purchase between signups takes the earlier one; equal ts matches") {
    val st = freshState(Some(Dim(List(100L, 300L))))
    val out = AsOfStream.update(1L,
      Iterator(pur(1L, 200L), pur(2L, 300L), pur(3L, 99L)), st).toSeq
      .sortBy(_.event_id)
    assert(out === Seq(
      Enriched(1L, 1L, 200L, 100L, 100L),
      Enriched(1L, 2L, 300L, 300L, 0L)))
    // event 3 at us=99 predates every signup: dropped (inner semantics)
  }

  test("same-timestamp signup and purchase in one batch: purchase matches it regardless of event_id order") {
    // ASOF matches signup_us <= purchase_us INCLUSIVELY; the purchase
    // has the SMALLER event_id, so an (us, event_id) fold would process
    // it before the signup and drop it — the fold must order signups
    // before purchases at equal us
    val st = freshState(None)
    val out = AsOfStream.update(1L,
      Iterator(pur(5L, 100L), sig(9L, 100L)), st).toSeq
    assert(out === Seq(Enriched(1L, 5L, 100L, 100L, 0L)))
    assert(st.get === Dim(List(100L)))
  }

  test("state carries across batches and duplicate signups stay distinct") {
    val st1 = freshState(None)
    AsOfStream.update(1L, Iterator(sig(1L, 100L), sig(2L, 100L)), st1).toSeq
    assert(st1.get === Dim(List(100L)))
    val st2 = freshState(Some(st1.get))
    val out = AsOfStream.update(1L, Iterator(pur(3L, 150L), sig(4L, 100L)), st2).toSeq
    assert(out === Seq(Enriched(1L, 3L, 150L, 100L, 50L)))
    assert(st2.get === Dim(List(100L)))
  }

  test("late-arriving signup that postdates pending purchases cannot corrupt matches") {
    // batch 1: signup at 100, purchase at 150 -> matched to 100
    val st1 = freshState(None)
    val out1 = AsOfStream.update(1L, Iterator(sig(1L, 100L), pur(2L, 150L)), st1).toSeq
    assert(out1 === Seq(Enriched(1L, 2L, 150L, 100L, 50L)))
    // batch 2 (late in processing time): signup at 50 — EARLIER in
    // event time than batch 1's, but every purchase it could affect is
    // in the future; the list keeps both and a later purchase still
    // floors correctly against the full history
    val st2 = freshState(Some(st1.get))
    val out2 = AsOfStream.update(1L, Iterator(sig(3L, 50L), pur(4L, 70L)), st2).toSeq
    assert(out2 === Seq(Enriched(1L, 4L, 70L, 50L, 20L)))
    assert(st2.get === Dim(List(50L, 100L)))
  }
}
