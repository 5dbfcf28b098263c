package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

/** Pins q176's sequence construction and regex-count semantics on a
  * crafted event stream: (ts, event_id) ordering incl. a timestamp tie,
  * and greedy non-overlapping pattern counts.
  */
class EventPatternSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val dir: String = {
    val tmp = Files.createTempDirectory("graft-pat").toString
    def t(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    // user 1 sequence by (ts, event_id): v c p v p e e e s v p → "vcpvpeeesvp"
    // the first two events share a timestamp with DIFFERENT types, so a
    // broken tie-break produces "cv..." and a different seq_md5
    // 'vp' 2; 'v+p' 2; 'ee+' 1 (eee); funnel s..v..p true
    val types = Seq("view", "click", "purchase", "view", "purchase",
      "error", "error", "error", "signup", "view", "purchase")
    val rows = types.zipWithIndex.map { case (ty, i) =>
      // two events share a timestamp — event_id must break the tie
      val ts = if (i == 1) t(0) else t(i)
      (i.toLong + 10L, ts, 1L, ty, 1.0, "{}")
    } :+ ((99L, t(30), 2L, "click", 1.0, "{}")) // user 2: "c" — no matches
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("sequence order, tie-break, and greedy pattern counts") {
    val rows = SparkEntry.queries("q176_event_pattern")(spark, dir)
      .as[(Long, Long, String, Long, Long, Long, Boolean)].collect().toSeq
    val u1 = rows.find(_._1 == 1L).get
    assert(u1._2 === 11L)
    // md5("vcpvpeeesvp") — pins the (ts, event_id) tie-break itself
    assert(u1._3 === "441513dedf5a5b4cbf965807375d15e5")
    assert(u1._4 === 2L) // 'vp' adjacencies
    assert(u1._5 === 2L) // 'v+p' greedy non-overlapping
    assert(u1._6 === 1L) // one 'ee+' run
    assert(u1._7)        // s..v..p funnel
    val u2 = rows.find(_._1 == 2L).get
    assert((u2._4, u2._5, u2._6, u2._7) === ((0L, 0L, 0L, false)))
    spark.catalog.clearCache()
  }
}
