package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SimilarityPack

/** Model check for q223's unrolled MMR rounds: an independent in-memory
  * greedy replay — plain Scala over collected scores and token sets —
  * must reproduce the DataFrame pipeline's picks and mmr values exactly
  * (the IterativeModelSpec discipline applied to the diversification
  * stage). Catches unroll bugs (a round reading the wrong pick, a
  * penalty joined on the wrong side) that the oracle can't, because the
  * oracle intentionally mirrors the same unrolled construction.
  */
class MmrModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = SparkTestSession.sfDir

  test("q223 equals an independent in-memory greedy MMR") {
    val ce = SimilarityPack.queries("q221_crossencoder_rerank")(spark, sfDir)
      .select("q_id", "vec_id", "score_q").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docsInPlay = ce.map(_._2).toSet
    val toks: Map[Long, Set[String]] = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        array_distinct(graft.functions.TextFunctions.tokens(col("text"))).as("ws"))
      .collect()
      .filter(r => docsInPlay(r.getLong(0)))
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    def jac(a: Long, b: Long): Long = {
      val (ta, tb) = (toks(a), toks(b))
      val inter = (ta & tb).size.toLong
      1000000L * inter / (ta.size + tb.size - inter)
    }
    // independent greedy: argmax (mmr desc, vec_id asc), penalty =
    // max similarity to any already-picked candidate, halved
    val expected = ce.groupBy(_._1).flatMap { case (q, cands0) =>
      val cands = cands0.map(c => (c._2, c._3)).toSeq
      var picked = Vector.empty[(Long, Long)] // (vec_id, mmr)
      for (_ <- 1 to 3) {
        val remaining = cands.filterNot(c => picked.exists(_._1 == c._1))
        val scored = remaining.map { case (v, s) =>
          val pen = if (picked.isEmpty) 0L
            else picked.map(p => jac(v, p._1)).max / 2
          (v, s - pen)
        }
        val best = scored.minBy { case (v, m) => (-m, v) }
        picked :+= best
      }
      picked.zipWithIndex.map { case ((v, m), i) => (q, i + 1, v, m) }
    }.toSet
    val actual = SimilarityPack.queries("q223_mmr_diversify")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(actual == expected,
      s"diff: actual-only=${(actual -- expected).take(3)} " +
        s"expected-only=${(expected -- actual).take(3)}")
  }
}
