package graft

import java.nio.file.Files
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

/** Brute-force models for the retrieval pack: q163's BM25 scores are
  * recomputed by an independent in-memory implementation, and q164's
  * winnowing selection is checked against a direct Scala transcription of
  * the SIGMOD 2003 algorithm — plus the algorithm's detection guarantee
  * (a shared w+k-1-token run must yield a shared fingerprint).
  */
class RetrievalPackSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // -- shared fixture corpus: mixed vocabulary, repeated phrases --
  private val docTexts: Seq[(Long, String)] = {
    val phrases = Seq(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "how vexingly quick daft zebras jump",
      "sphinx of black quartz judge my vow",
      "the five boxing wizards jump quickly")
    (0L until 20L).map { i =>
      val p = phrases((i % phrases.size).toInt)
      val extra = Seq.fill((i % 4).toInt + 1)(s"tok$i").mkString(" ")
      (i, s"$p $extra ${phrases(((i + 1) % phrases.size).toInt)}")
    }
  }

  private lazy val dir: String = {
    val tmp = Files.createTempDirectory("graft-retr").toString
    docTexts.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  // -- model-side tokenization (mirrors TextFunctions.tokens) --
  private def toks(text: String): Seq[String] =
    text.replaceAll("(?U)[^\\w\\s]", "").split("(?U)\\s+").filter(_.nonEmpty).toSeq

  private def hex64(s: String): Long = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("q163 BM25 equals the brute-force model") {
    val tokd = docTexts.map { case (id, t) => id -> toks(t) }.toMap
    val tf = tokd.map { case (id, ts) => id -> ts.groupBy(identity).map { case (w, g) => w -> g.size.toLong } }
    val dl = tokd.map { case (id, ts) => id -> ts.size.toLong }
    val dfreq = tf.values.flatMap(_.keys).groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val nDocs = tokd.size.toLong
    val sumDl = dl.values.sum
    val qterms = dfreq.toSeq.sortBy { case (w, df) => (-df, w) }.take(14)
      .zipWithIndex.map { case ((w, df), i) => (w, df, i + 1) }
      .filter { case (_, _, rk) => rk >= 10 && rk <= 14 }
    val expected = qterms.flatMap { case (w, df, qRank) =>
      val scored = tf.toSeq.flatMap { case (id, m) =>
        m.get(w).map { cnt =>
          val idfQ = math.floor(math.log(
            (nDocs.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5) + 1.0) * 1e6).toLong
          val tfnorm = (cnt.toDouble * 2.2) /
            (cnt.toDouble + 1.2 * (0.25 + 0.75 * (dl(id).toDouble * nDocs.toDouble / sumDl.toDouble)))
          val scoreQ = math.floor(idfQ.toDouble * tfnorm).toLong
          (id, cnt, scoreQ)
        }
      }.sortBy { case (id, _, sq) => (-sq, id) }.take(10)
      scored.zipWithIndex.map { case ((id, cnt, sq), i) =>
        (qRank, w, i + 1, id, cnt, dl(id), df, sq)
      }
    }.sortBy(r => (r._1, r._3))
    val got = SparkEntry.queries("q163_bm25")(spark, dir)
      .as[(Int, String, Int, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === expected)
    spark.catalog.clearCache()
  }

  /** Direct transcription of robust winnowing (w=4 over token 4-gram
    * hashes, rightmost-min tie break): returns the selected position set
    * and fingerprint set for one document. */
  private def winnow(ts: Seq[String]): (Seq[Long], Set[Int], Set[Long]) = {
    val grams = ts.sliding(4).filter(_.size == 4).map(_.mkString(" ")).toSeq
    val h = grams.map(hex64)
    val n = h.size
    if (n == 0) return (h, Set.empty, Set.empty)
    val starts = 0 until math.max(n - 3, 1)
    val sel = starts.map { p =>
      val win = h.slice(p, math.min(p + 4, n))
      val m = win.min
      p + win.lastIndexWhere(_ == m)
    }.toSet
    (h, sel, sel.map(h))
  }

  test("q164 equals the direct winnowing transcription") {
    val expected = docTexts.map { case (id, t) =>
      val ts = toks(t)
      val (h, sel, fp) = winnow(ts)
      (id, h.size.toLong, math.max(h.size - 3, 1).toLong, sel.size.toLong,
        fp.size.toLong, fp.min, fp.max, fp.toSeq.map(_ % 1000000000L).sum)
    }.filter(_._2 > 0).sortBy(_._1)
    val got = SparkEntry.queries("q164_winnow_fingerprint")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === expected)
    spark.catalog.clearCache()
  }

  test("winnowing guarantee: a shared 7-token run yields a shared fingerprint") {
    // w + k - 1 = 7: any shared run of 7 tokens spans a full window of
    // 4-gram hashes, and both docs select the same minimal gram in it
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val a = toks(s"one two three four five six $shared")
    val b = toks(s"$shared uno dos tres cuatro cinco seis")
    val (_, _, fpA) = winnow(a)
    val (_, _, fpB) = winnow(b)
    assert((fpA intersect fpB).nonEmpty)
  }

  test("q168 prefix-filtered join equals brute-force all-pairs Jaccard") {
    // model: 3-gram shingle sets per doc, exact Jaccard over every pair
    val sh = docTexts.map { case (id, t) =>
      id -> toks(t).sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet.map(hex64)
    }.filter(_._2.nonEmpty)
    val expected = (for {
      (i, si) <- sh; (j, sj) <- sh if i < j
      inter = (si intersect sj).size
      union = si.size + sj.size - inter
      jac = inter.toDouble / union.toDouble if jac >= 0.5
    } yield (i, j, inter.toLong, jac)).toSeq.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("q168_ppjoin_exact")(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === expected)
    assert(got.nonEmpty) // fixture must actually exercise the join
    spark.catalog.clearCache()
  }

  test("q165 streamed SpaceSaving equals batch q69 row-for-row") {
    val batch = SparkEntry.queries("q69_top_tokens_sketch")(spark, SparkTestSession.sfDir)
      .as[(String, Int, String, Long)].collect().toSeq
    val streamed = SparkEntry.queries("q165_stream_topk_sketch")(spark, SparkTestSession.sfDir)
      .as[(String, Int, String, Long)].collect().toSeq
    assert(streamed === batch)
    spark.catalog.clearCache()
  }
}
