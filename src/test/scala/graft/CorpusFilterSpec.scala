package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Hand-computable fixtures for the corpus-filter queries:
  * q04 segment-level exact dedup (C4 line-dedup analogue, 4-token
  * segments, corpus-wide keep-first) and q79 repetition metrics
  * (Gopher/MassiveText duplicate-n-gram rules).
  */
class CorpusFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val texts = Seq(
    // q04: doc 0 owns both its segments; doc 1 repeats doc 0's first
    // segment ("a b c d") and adds a fresh one; doc 2 is one whole
    // duplicated segment; doc 3 repeats within ITSELF (second occurrence
    // loses to the first by seg_idx)
    0L -> "a b c d e f g h",
    1L -> "a b c d x y z w",
    2L -> "a b c d",
    3L -> "m n o p m n o p",
    // q79: doc 4 is maximally repetitious, doc 5 has all-distinct bigrams
    4L -> "p q p q p q p q",
    5L -> "r s t u v")

  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("graft_corpusfilter_fixture").toString
    texts.map { case (id, t) => (id, t, "en", "fixture", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q04: keep-first segment dedup with known winners") {
    val got = SparkEntry.queries("q04_segment_dedup")(spark, fixtureDir)
      .select($"doc_id", $"n_segments", $"n_kept", $"retained_frac")
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    val expect = Seq(
      (0L, 2L, 2L, 1.0), // "a b c d" | "e f g h": both first occurrences
      (1L, 2L, 1L, 0.5), // "a b c d" lost to doc 0; "x y z w" kept
      (2L, 1L, 0L, 0.0), // whole doc is one duplicated segment
      (3L, 2L, 1L, 0.5), // self-repeat: "m n o p" twice, seg_idx 1 loses
      (4L, 2L, 1L, 0.5), // "p q p q" twice, seg_idx 1 loses
      (5L, 2L, 2L, 1.0)) // "r s t u" | "v" (partial tail segment): unique
    assert(got === expect)
  }

  test("q79: repetition metrics on hand-computable docs") {
    val got = SparkEntry.queries("q79_repetition_filter")(spark, fixtureDir)
      .select($"doc_id", $"n_bigrams", $"dup_bigram_frac", $"top_bigram_frac", $"keep")
      .as[(Long, Long, Double, Double, Boolean)].collect().toSeq.sortBy(_._1)
      .map { case (id, nb, db, tb, k) =>
        (id, nb, math.rint(db * 1e9) / 1e9, math.rint(tb * 1e9) / 1e9, k) }
    // doc 4 "p q p q p q p q": bigrams = [pq,qp,pq,qp,pq,qp,pq] (7),
    // distinct 2 -> dup_frac 5/7; top "p q" count 4 -> 4/7; dropped
    val d4 = got.find(_._1 == 4L).get
    assert(d4._2 === 7L)
    assert(d4._3 === math.rint(5.0 / 7.0 * 1e9) / 1e9)
    assert(d4._4 === math.rint(4.0 / 7.0 * 1e9) / 1e9)
    assert(!d4._5)
    // doc 5 "r s t u v": 4 bigrams, all distinct, top count 1 -> kept?
    // top_bigram_frac = 1/4 = 0.25 > 0.06 -> the threshold targets
    // realistic doc lengths; on a 5-token doc a single bigram is 25%.
    val d5 = got.find(_._1 == 5L).get
    assert(d5._2 === 4L && d5._3 === 0.0)
    // doc 0 "a b c d e f g h": 7 distinct bigrams, dup 0, top 1/7 > 0.06
    val d0 = got.find(_._1 == 0L).get
    assert(d0._3 === 0.0 && !d0._5 === (1.0 / 7.0 > 0.06))
  }
}
