package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins q116's concat-and-chunk packing against a hand-computed layout:
  * per-source prefix sums, boundary-spanning docs counted in every
  * chunk they touch, clipped token overlap per chunk, and the empty-doc
  * filter.
  */
class SeqPackSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val dir: String = {
    val tmp = Files.createTempDirectory("graft-seqpack").toString
    def words(n: Int): String = Seq.fill(n)("w").mkString(" ")
    // s0: 300 + 300 tokens → chunk 0 holds doc0's 300 + doc1's first
    // 212; chunk 1 holds doc1's last 88. s1: one 600-token doc spans
    // chunks 0 (512) and 1 (88). doc3 is empty and must vanish.
    Seq(
      (0L, words(300), "en", "s0", 600L),
      (1L, words(300), "en", "s0", 600L),
      (2L, words(600), "en", "s1", 1200L),
      (3L, "", "en", "s1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("chunk layout equals the hand-computed packing") {
    val rows = SparkEntry.queries("q116_seq_pack")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows === Seq(
      ("s0", 0L, 2L, 512L, 0L, 1L),
      ("s0", 1L, 1L, 88L, 1L, 1L),
      ("s1", 0L, 1L, 512L, 2L, 2L),
      ("s1", 1L, 1L, 88L, 2L, 2L)))
    spark.catalog.clearCache()
  }
}
