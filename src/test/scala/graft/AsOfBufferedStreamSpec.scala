package graft.streaming

import org.apache.spark.api.java.Optional

import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.AsOfBufferedStream.{BufState, Pend}
import graft.streaming.AsOfStream.Enriched
import graft.streaming.AsOfBufferedStream.BEv

/** Pins q428's stateful core with Spark's TestGroupState harness: a
  * purchase must BUFFER until the watermark passes it, a signup arriving
  * in a LATER micro-batch (but within the watermark) must still enrich
  * it — the exact sequence q422's eager emission provably misses — and
  * the flush must drain through event-time timeouts on quiet keys.
  */
class AsOfBufferedStreamSpec extends AnyFunSuite {

  private def state(init: Option[BufState], wmMs: Long,
                    timedOut: Boolean = false): TestGroupState[BufState] =
    TestGroupState.create[BufState](
      init.map(Optional.of[BufState]).getOrElse(Optional.empty[BufState]()),
      GroupStateTimeout.EventTimeTimeout, 0L, Optional.of(wmMs), timedOut)

  private def ev(id: Long, t: String, us: Long) =
    BEv(1L, id, t, us, new java.sql.Timestamp(us / 1000L))
  private def sig(id: Long, us: Long) = ev(id, "signup", us)
  private def pur(id: Long, us: Long) = ev(id, "purchase", us)

  test("late signup in a later batch still enriches the buffered purchase (q422's miss)") {
    // batch 1 (watermark 0): purchase at 150_000 us buffers, nothing emits
    val st1 = state(None, wmMs = 0L)
    val out1 = AsOfBufferedStream.update(1L,
      Iterator(pur(30L, 150000L), sig(10L, 100000L)), st1).toSeq
    assert(out1.isEmpty)
    assert(st1.get === BufState(List(100000L), List(Pend(30L, 150000L))))
    // the group armed a timeout at the earliest pending purchase
    assert(st1.getTimeoutTimestampMs.get() === 150000L / 1000L + 1L)

    // batch 2: a LATE signup at 120_000 us — AFTER the purchase already
    // arrived, but still before it in event time; watermark (100 ms)
    // hasn't passed the purchase yet, so it keeps buffering
    val st2 = state(Some(st1.get), wmMs = 100L)
    val out2 = AsOfBufferedStream.update(1L, Iterator(sig(11L, 120000L)), st2).toSeq
    assert(out2.isEmpty)
    assert(st2.get === BufState(List(100000L, 120000L), List(Pend(30L, 150000L))))

    // batch 3: watermark passes the purchase (200 ms = 200_000 us) via a
    // TIMEOUT invocation (no new data) — the flush matches the LATE
    // signup at 120_000, which q422 would have missed (it emitted at
    // batch 1 against signup 100_000)
    val st3 = state(Some(st2.get), wmMs = 200L, timedOut = true)
    val out3 = AsOfBufferedStream.update(1L, Iterator.empty, st3).toSeq
    assert(out3 === Seq(Enriched(1L, 30L, 150000L, 120000L, 30000L)))
    // eviction: watermark 200 ms makes 120k the floor anchor; 100k can
    // never be matched by an in-contract purchase again
    assert(st3.get === BufState(List(120000L), Nil))
  }

  test("flush is exactly the pending purchases at or below the watermark, in (us, event_id) order") {
    val init = BufState(List(50000L),
      List(Pend(5L, 300000L), Pend(3L, 150000L), Pend(4L, 150000L), Pend(2L, 80000L)))
    val st = state(Some(init), wmMs = 150L)
    val out = AsOfBufferedStream.update(1L, Iterator.empty, st).toSeq
    assert(out === Seq(
      Enriched(1L, 2L, 80000L, 50000L, 30000L),
      Enriched(1L, 3L, 150000L, 50000L, 100000L),
      Enriched(1L, 4L, 150000L, 50000L, 100000L)))
    assert(st.get === BufState(List(50000L), List(Pend(5L, 300000L))))
    assert(st.getTimeoutTimestampMs.get() === 300000L / 1000L + 1L)
  }

  test("a purchase with no prior signup flushes to nothing (inner semantics)") {
    val st = state(Some(BufState(List(500000L), List(Pend(9L, 100000L)))), wmMs = 400L)
    val out = AsOfBufferedStream.update(1L, Iterator.empty, st).toSeq
    assert(out.isEmpty)
    assert(st.get === BufState(List(500000L), Nil))
  }

  test("watermark evicts signups below the floor anchor; the anchor still enriches") {
    // signups at 10k/20k/30k us, watermark 25 ms (= 25_000 us): 10k can
    // never be a floor again (any in-contract purchase has us > 25_000,
    // and 20k dominates 10k for those); 20k survives as the anchor
    val st1 = state(Some(BufState(List(10000L, 20000L, 30000L), Nil)), wmMs = 25L)
    assert(AsOfBufferedStream.update(1L, Iterator.empty, st1).isEmpty)
    assert(st1.get === BufState(List(20000L, 30000L), Nil))

    // a later purchase between anchor and the surviving signup floors
    // to the ANCHOR — eviction must not have removed it
    val st2 = state(Some(st1.get), wmMs = 25L)
    assert(AsOfBufferedStream.update(1L, Iterator(pur(7L, 27000L)), st2).isEmpty)
    val st3 = state(Some(st2.get), wmMs = 40L, timedOut = true)
    val out = AsOfBufferedStream.update(1L, Iterator.empty, st3).toSeq
    assert(out === Seq(Enriched(1L, 7L, 27000L, 20000L, 7000L)))
    // and at watermark 40 ms the anchor advances to 30k, dropping 20k
    assert(st3.get === BufState(List(30000L), Nil))
  }

  test("sentinel and unrelated event types are watermark fuel only") {
    val st = state(None, wmMs = 0L)
    val out = AsOfBufferedStream.update(-1L,
      Iterator(BEv(-1L, -2L, "sentinel", 999999999L, new java.sql.Timestamp(999999L)),
        BEv(-1L, -3L, "click", 5L, new java.sql.Timestamp(0L))), st).toSeq
    assert(out.isEmpty)
    assert(st.get === BufState(Nil, Nil))
  }
}
