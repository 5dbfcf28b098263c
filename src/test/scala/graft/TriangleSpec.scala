package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins q118's graph semantics on a crafted corpus: edges only from
  * adjacent co-occurrence seen in ≥3 distinct docs (the 2-doc edge must
  * NOT appear), ordered-edge normalization, and per-word triangle
  * participation.
  */
class TriangleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val dir: String = {
    val tmp = Files.createTempDirectory("graft-tri").toString
    // edges a-b, b-c, a-c (3 docs each → a closed triangle), a-d
    // (3 docs, pendant — no triangle), c-d (2 docs — below threshold)
    val texts =
      Seq.fill(3)("a b") ++ Seq.fill(3)("b c") ++ Seq.fill(3)("c a") ++
        Seq.fill(3)("a d") ++ Seq.fill(2)("c d")
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("per-word triangle counts equal the hand-built graph") {
    val rows = SparkEntry.queries("q118_triangle_count")(spark, dir)
      .as[(String, Long)].collect().toSeq
    assert(rows === Seq(("a", 1L), ("b", 1L), ("c", 1L)))
    spark.catalog.clearCache()
  }
}
