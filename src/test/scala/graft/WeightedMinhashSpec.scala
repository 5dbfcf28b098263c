package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins q252's weighted-MinHash semantics against a plain-Scala model:
  * the unary-expansion construction must reproduce the direct
  * Σ-min/Σ-max weighted Jaccard exactly on every emitted pair, exact
  * duplicates must always surface, and a boilerplate-heavy pair whose
  * PLAIN shingle Jaccard clears 0.85 must be rejected by the weighted
  * threshold — the downweighting property the operator exists for.
  */
class WeightedMinhashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic "rare" filler, unique per (doc, slot)
  private def rare(doc: Int, n: Int): String =
    (0 until n).map(i => s"u${doc}x$i").mkString(" ")

  private val boiler = (0 until 120).map(i => s"tpl$i").mkString(" ")

  // docs 0,1: identical content (weighted J = 1). docs 10..21: the
  // boilerplate family — shared 120-token template + 5 unique rare
  // tokens each → plain shingle J ≈ 0.89 per pair, weighted ≈ 0.68.
  private lazy val texts: Map[Long, String] =
    (Map(0L -> s"alpha beta gamma delta ${rare(0, 30)}",
         1L -> s"alpha beta gamma delta ${rare(0, 30)}") ++
      (10 to 21).map(i => i.toLong -> s"$boiler ${rare(i, 5)}").toMap)

  private lazy val dir: String = {
    val tmp = Files.createTempDirectory("graft-wminhash").toString
    texts.toSeq.sortBy(_._1).map { case (id, t) => (id, t, "en", "s0", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  // ---- plain-Scala model ----
  private def shingles(t: String): Set[String] =
    t.split("\\s+").filter(_.nonEmpty).sliding(3).filter(_.size == 3)
      .map(_.mkString(" ")).toSet
  private lazy val sh: Map[Long, Set[String]] = texts.map { case (k, t) => k -> shingles(t) }
  private lazy val df: Map[String, Int] =
    sh.values.flatten.groupBy(identity).map { case (s, o) => s -> o.size }
  private def w(s: String): Long = df(s) match {
    case 1 => 4L case d if d <= 3 => 3L case d if d <= 9 => 2L case _ => 1L
  }
  private def wJacc(a: Long, b: Long): (Long, Long) = {
    val common = (sh(a) & sh(b)).toSeq.map(w).sum
    val union = sh(a).toSeq.map(w).sum + sh(b).toSeq.map(w).sum - common
    (common, union)
  }
  private def plainJacc(a: Long, b: Long): Double =
    (sh(a) & sh(b)).size.toDouble / (sh(a) | sh(b)).size

  test("emitted pairs match the direct weighted-Jaccard model; exact dups always surface") {
    val rows = SparkEntry.queries("q252_weighted_minhash")(spark, dir)
      .select("doc_i", "doc_j", "w_common", "w_union", "wjacc_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.exists(r => r._1 == 0L && r._2 == 1L),
      "identical docs must be a weighted near-dup pair")
    rows.foreach { case (i, j, c, u, ppm) =>
      val (mc, mu) = wJacc(i, j)
      assert((c, u) === ((mc, mu)), s"pair ($i,$j)")
      assert(ppm === mc * 1000000L / mu, s"pair ($i,$j) ppm")
      assert(ppm >= 800000L)
    }
    spark.catalog.clearCache()
  }

  test("boilerplate pairs clear the plain threshold but fail the weighted one") {
    // the property the weighting exists for, checked in the model first
    assert(plainJacc(10L, 11L) >= 0.85)
    val (c, u) = wJacc(10L, 11L)
    assert(c * 1000000L / u < 800000L)
    // and therefore no boilerplate-family pair may be emitted
    val rows = SparkEntry.queries("q252_weighted_minhash")(spark, dir)
      .select("doc_i", "doc_j").as[(Long, Long)].collect().toSeq
    assert(!rows.exists { case (i, j) => i >= 10L && j >= 10L })
    spark.catalog.clearCache()
  }
}
