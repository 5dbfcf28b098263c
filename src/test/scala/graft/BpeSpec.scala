package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins q108's BPE training semantics against a hand-computed model on
  * a crafted corpus — beyond the dual-engine gate (which proves both
  * engines agree, not that they agree with BPE): weighted pair counts
  * (word frequency × adjacent positions, overlapping positions each
  * counted), the (count DESC, left, right) argmax, and the documented
  * replace() rewrite including its adjacent-run under-merge
  * ("a a a" → "aa a", not "aa aa").
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // words: "aaa" ×2, "bb" ×1, "ab" ×3
  // round 1: (a,a) 2 positions × 2 = 4  >  (a,b) 3  >  (b,b) 1 → merge (a,a)
  //          "a a a" → "aa a" (left-to-right non-overlap: ONE merge)
  // round 2: (a,b) 3 > (aa,a) 2 > (b,b) 1 → merge (a,b)
  // round 3: (aa,a) 2 > (b,b) 1 → merge (aa,a)
  private lazy val dir: String = {
    val tmp = Files.createTempDirectory("graft-bpe").toString
    val docs = Seq(
      (0L, "aaa ab", "en", "s0", 6L),
      (1L, "aaa ab", "en", "s0", 6L),
      (2L, "bb ab", "en", "s0", 5L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("merge trajectory equals the hand-computed BPE model") {
    val rows = SparkEntry.queries("q108_bpe_train")(spark, dir)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    spark.catalog.clearCache()
    assert(rows.take(3) === Seq(
      (1, "a", "a", 4L),
      (2, "a", "b", 3L),
      (3, "aa", "a", 2L)))
  }
}
