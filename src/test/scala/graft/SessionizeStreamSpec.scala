package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.SessionizeStream
import graft.operators.EventsPack

/** The streaming sessionizer (flatMapGroupsWithState + event-time timeout)
  * must agree with the batch lag-gap-cumsum sessionization on every session
  * the watermark was able to close; the per-user tail session (still open
  * at end-of-stream) is legitimately withheld.
  */
class SessionizeStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  test("streamed sessions == batch sessions closed by the watermark") {
    val streamed = SessionizeStream.run(spark, dir)
      .collect()
      .map(s => (s.user_id, s.start_us, s.end_us, s.n_events))
      .toSet

    val batch = EventsPack.queries("q32_sessionize")(spark, dir)
      .select(col("user_id"), unix_micros(col("session_start")).as("s"),
              unix_micros(col("session_end")).as("e"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    val maxUs = graft.core.Tables.events(spark, dir)
      .agg(max(unix_micros(col("ts")))).head().getLong(0)

    // every streamed session is a real batch session
    val phantom = streamed -- batch
    assert(phantom.isEmpty, s"streamed sessions not in batch: ${phantom.take(3)}")

    // every batch session safely past the watermark horizon was emitted
    val margin = 2000000L // 2s slack for ms-granularity watermark arithmetic
    val mustEmit = batch.filter { case (_, _, e, _) =>
      e + SessionizeStream.gapUs + margin < maxUs }
    val missing = mustEmit -- streamed
    assert(missing.isEmpty, s"closed sessions not emitted: ${missing.take(3)}")
    assert(streamed.nonEmpty)
  }
}
