package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins q119/q120's classifier semantics on a crafted corpus: the
  * doc_id %% 5 train/held split, Laplace smoothing (a held-out doc whose
  * tokens are unseen in one class must still score finitely there), and
  * argmax with the (score desc, lang) tie-break.
  */
class NaiveBayesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val dir: String = {
    val tmp = Files.createTempDirectory("graft-nb").toString
    // held-out docs are 0 and 5 (doc_id % 5 == 0); the rest train.
    // "en" speaks {cat, dog}; "xx" speaks {foo, bar, baz} — disjoint
    // vocabularies, so the evidence term must dominate the prior.
    val rows = Seq(
      (0L, "cat dog cat", "en"), (5L, "foo bar", "xx"),
      (1L, "cat dog", "en"), (2L, "dog cat cat", "en"),
      (3L, "cat cat", "en"), (4L, "dog dog cat", "en"),
      (6L, "foo bar baz", "xx"), (7L, "bar baz", "xx"),
      (8L, "foo foo", "xx"), (9L, "baz foo bar", "xx"))
    rows.map { case (id, t, l) => (id, t, l, "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("train half counts only the held-in split") {
    val rows = SparkEntry.queries("q119_nb_train")(spark, dir)
      .select("lang", "rank", "w", "cnt").as[(String, Long, String, Long)]
      .collect().toSeq
    // en train tokens: docs 1-4 = cat x6, dog x4 (doc 0 excluded)
    assert(rows.filter(_._1 == "en") ===
      Seq(("en", 1L, "cat", 6L), ("en", 2L, "dog", 4L)))
    spark.catalog.clearCache()
  }

  test("held-out docs classify to their own language") {
    val rows = SparkEntry.queries("q120_nb_classify")(spark, dir)
      .select("doc_id", "pred_lang", "correct").as[(Long, String, Long)]
      .collect().toSeq
    assert(rows === Seq((0L, "en", 1L), (5L, "xx", 1L)))
    spark.catalog.clearCache()
  }

  test("confusion matrix folds the argmax stream; recall in integer ppm") {
    val rows = SparkEntry.queries("q128_nb_confusion")(spark, dir)
      .select("true_lang", "pred_lang", "n_docs", "n_true", "recall_ppm")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    // both held-out docs classify correctly -> diagonal-only matrix
    assert(rows === Seq(
      ("en", "en", 1L, 1L, 1000000L),
      ("xx", "xx", 1L, 1L, 1000000L)))
    spark.catalog.clearCache()
  }
}
