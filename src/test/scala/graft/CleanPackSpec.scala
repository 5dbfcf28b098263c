package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins CleanPack semantics beyond the dual-engine gate:
  *   - q113's symmetric-delete linkage equals a brute-force
  *     deletion-neighborhood model, including ambiguity resolution by
  *     (distance, key) argmin and duplicate-name candidates;
  *   - q111's quantized entropy equals the hand-computed value and the
  *     keep band actually rejects low-entropy junk.
  */
class CleanPackSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val dir: String = {
    val tmp = Files.createTempDirectory("graft-clean").toString
    // length-18 names; keys 5 and 6 share a name so one dirty string
    // has two clean candidates and the (lev, key) argmin must pick 5
    val names = Seq(
      0L -> "alpha-store-000001",
      1L -> "alpha-store-000002",
      2L -> "beta-market-00x-07",
      3L -> "gamma-depot-999999",
      4L -> "delta-outlet-55555",
      5L -> "twin-name-duplicat",
      6L -> "twin-name-duplicat",
      7L -> "omega-shop-abcdefg")
    names.map { case (k, n) => (k, n, 1, 10.0, "SEG") }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    Seq((0L, "aab", "en", "s0", 3L), (1L, "zzzzzzzz", "en", "s0", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  private def deletions(s: String): Seq[String] =
    s.indices.map(i => s.take(i) + s.drop(i + 1))

  test("q113 equals the brute-force deletion-neighborhood model") {
    val clean = Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L).zip(Seq(
      "alpha-store-000001", "alpha-store-000002", "beta-market-00x-07",
      "gamma-depot-999999", "delta-outlet-55555", "twin-name-duplicat",
      "twin-name-duplicat", "omega-shop-abcdefg"))
    val dirty = clean.map { case (k, n) =>
      val pos = (10 + k % 8).toInt // 1-based delete position
      (k, n.take(pos - 1) + n.drop(pos))
    }
    val expected = dirty.map { case (dk, dn) =>
      val candidates = clean.filter { case (_, cn) => deletions(cn).contains(dn) }
      val (mk, mn) = candidates.minBy(_._1)
      (dk, dn, mk, mn, 1L)
    }.sortBy(_._1)

    val rows = SparkEntry.queries("q113_fuzzy_match")(spark, dir)
      .as[(Long, String, Long, String, Long)].collect().toSeq
    assert(rows === expected)
    // the shared-name pair resolved to the smaller key
    assert(rows.filter(_._4 == "twin-name-duplicat").map(_._3).toSet === Set(5L))
  }

  test("q111 entropy is the hand-computed quantized value; band rejects junk") {
    def qln(x: Long): Long = math.floor(math.log(x.toDouble) * 1e6).toLong
    // "aab": n=3, counts a:2 b:1 → ent_q = 3·qln(3) − 2·qln(2) − 1·qln(1)
    val expAab = 3 * qln(3) - 2 * qln(2) - 1 * qln(1)
    val rows = SparkEntry.queries("q111_char_entropy")(spark, dir)
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(rows(0) === ((0L, 3L, 2L, expAab, false))) // 0.64 nats/char < 2.0
    assert(rows(1) === ((1L, 8L, 1L, 0L, false)))     // single-char junk: 0 entropy
    spark.catalog.clearCache()
  }

  test("q166 winsorized stats equal the brute-force model on sf0.001") {
    val docs = SparkTestSession.spark.read
      .parquet(s"${SparkTestSession.sfDir}/documents.parquet")
      .select("source", "doc_id", "n_chars")
      .as[(String, Long, Long)].collect().toSeq
    val expected = docs.groupBy(_._1).toSeq.map { case (src, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val n = sorted.size
      val lo = sorted(((n - 1) * 5 / 100).toInt)
      val hi = sorted(((n - 1) * 95 / 100).toInt)
      val win = sorted.map(v => math.min(math.max(v, lo), hi))
      (src, n.toLong, lo, hi, sorted.sum, win.sum,
        sorted.count(_ < lo).toLong, sorted.count(_ > hi).toLong,
        win.sum.toDouble / n.toDouble)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q166_winsorize")(spark, SparkTestSession.sfDir)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Double)]
      .collect().toSeq
    assert(got === expected)
    spark.catalog.clearCache()
  }

  test("q170 moments equal the brute-force model on sf0.001") {
    val q = SparkTestSession.spark.read
      .parquet(s"${SparkTestSession.sfDir}/lineitem.parquet")
      .selectExpr("l_returnflag AS grp",
        "CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS q")
      .as[(String, Long)].collect().toSeq
    val expected = q.groupBy(_._1).toSeq.map { case (grp, rows) =>
      val v = rows.map(_._2)
      val n = v.size.toLong
      val (s1, s2, s3) = (v.sum, v.map(x => x * x).sum, v.map(x => x * x * x).sum)
      val mean = s1.toDouble / n.toDouble
      val variance = s2.toDouble / n.toDouble - (s1.toDouble / n.toDouble) * (s1.toDouble / n.toDouble)
      val skew = if (variance <= 0.0) 0.0
        else (s3.toDouble / n.toDouble - 3.0 * mean * (s2.toDouble / n.toDouble) +
          2.0 * mean * mean * mean) / (variance * math.sqrt(variance))
      (grp, n, s1, s2, s3, mean, variance, skew)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q170_group_moments")(spark, SparkTestSession.sfDir)
      // s2/s3 are DECIMAL(38,0) sums (int64 would overflow near ~3e8
      // rows/group at scale); they fit long on this corpus
      .selectExpr("grp", "n", "s1", "CAST(s2 AS BIGINT) AS s2",
        "CAST(s3 AS BIGINT) AS s3", "mean", "variance", "skewness")
      .as[(String, Long, Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got === expected)
    spark.catalog.clearCache()
  }

  test("q171 histogram median agrees with q83's row-sort median") {
    // two exact algorithms over the same data must agree (up to the
    // cents-vs-raw-double arithmetic path)
    val sorted = SparkEntry.queries("q83_median")(spark, SparkTestSession.sfDir)
      .as[(String, Double)].collect().toMap
    val hist = SparkEntry.queries("q171_median_histogram")(spark, SparkTestSession.sfDir)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(hist.map(_._1).toSet === sorted.keySet)
    hist.foreach { case (grp, _, lo, hi, med) =>
      assert(lo <= hi)
      assert(math.abs(med - sorted(grp)) < 1e-9, s"group $grp: $med vs ${sorted(grp)}")
    }
    spark.catalog.clearCache()
  }

  test("q167 bootstrap replicates: weights are hash-determined and means bracket the truth") {
    val rows = SparkEntry.queries("q167_bootstrap_ci")(spark, SparkTestSession.sfDir)
      .as[(Int, Long, Long, Double, Double)].collect().toSeq
    assert(rows.size === 32 && rows.map(_._1) === (0 until 32))
    val overall = rows.head._5
    // Poisson(1) weights: every replicate's effective size is within
    // ±25% of the corpus (tight at 500 docs), and the replicate-mean
    // spread brackets the point estimate
    val nDocs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet").count()
    rows.foreach { case (_, nEff, _, _, _) =>
      assert(math.abs(nEff - nDocs).toDouble / nDocs < 0.25)
    }
    val means = rows.map(_._4)
    assert(means.min <= overall && overall <= means.max)
    spark.catalog.clearCache()
  }
}
