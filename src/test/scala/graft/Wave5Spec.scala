package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed pins for the wave-5 operators: Jarque–Bera on a
  * textbook sample, Mann–Kendall on a strictly increasing series,
  * Good–Turing on a constructed frequency-of-frequencies ladder, the
  * burstiness query's exponential/constant-gap fixed point, and the
  * sorted-neighborhood audit's designed recall semantics (late-digit
  * transpositions found at offset 1, prefix-damaged records
  * unreachable by any affordable window).
  */
class Wave5Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_wave5_spec").toString

  private def writeDocs(dir: String, rows: Seq[(Long, String, String, String, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private def writeEvents(dir: String, rows: Seq[(Long, Timestamp, Long, String, Double, String)]): Unit = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def writeCustomers(dir: String, n: Int): Unit = {
    import spark.implicits._
    (1 to n).map { k =>
      (k.toLong, f"Customer#$k%09d", 0, 0.0, "BUILDING")
    }.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
  }

  test("q369 Jarque-Bera reproduces the hand-computed sample") {
    // {2,4,4,4,5,5,7,9}: mean 5, m2 4, m3 5.25, m4 44.5
    // g1 = 0.65625, g2 = -0.21875, JB = 8/6*(g1^2 + g2^2/4) = 0.5901692...
    val d = tmpDir()
    writeDocs(d, Seq(2L, 4L, 4L, 4L, 5L, 5L, 7L, 9L).zipWithIndex.map {
      case (len, i) => (i.toLong, "x", "en", "s0", len)
    })
    val r = graft.operators.AnalyticsPack.queries("q369_jarque_bera")(spark, d)
      .collect()
    assert(r.length == 1)
    assert(r(0).getAs[Double]("mean") == 5.0)
    assert(r(0).getAs[Double]("variance") == 4.0)
    assert(math.abs(r(0).getAs[Double]("skewness") - 0.65625) < 1e-12)
    assert(math.abs(r(0).getAs[Double]("kurtosis_excess") + 0.21875) < 1e-12)
    val jb = 8.0 / 6.0 * (0.65625 * 0.65625 + 0.21875 * 0.21875 / 4.0)
    assert(math.abs(r(0).getAs[Double]("jb") - jb) < 1e-12)
    assert(!r(0).getAs[Boolean]("reject_normal"))
  }

  test("q370 Mann-Kendall on a strictly increasing series") {
    // daily counts 1,2,3,4,5: S = 10, ties on x none, var18 = 5*4*15 = 300
    // z = (10-1)/sqrt(300/18) = 9/sqrt(16.666..) = 2.2045 -> 2204 milli
    val d = tmpDir()
    val rows = for {
      day <- 0 until 5
      j <- 0 to day // day i has i+1 events
    } yield ((day * 10 + j).toLong,
      Timestamp.valueOf(f"2024-01-${day + 1}%02d 10:0$j:00"),
      1L, "view", 0.0, "{}")
    writeEvents(d, rows)
    val r = graft.operators.AnalyticsPack.queries("q370_mann_kendall")(spark, d)
      .collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_days") == 5L)
    assert(r(0).getAs[Long]("s_stat") == 10L)
    assert(r(0).getAs[Long]("var18") == 300L)
    assert(r(0).getAs[Long]("z_milli") == 2204L)
    assert(r(0).getAs[String]("trend") == "increasing")
  }

  test("q372 Good-Turing ladder on constructed trigram multiplicities") {
    // one-trigram docs: "a b c" x3, "d e f" x1, "g h i" x2
    // fof: N1=1, N2=1, N3=1, N=6 tokens of trigram mass
    // r=1: r* = 2*N2/N1 = 2 (2000 milli); r=2: 3*N3/N2 = 3; r=3: next 0
    // P0 = N1/N = 1/6 -> 166666 ppm
    val d = tmpDir()
    writeDocs(d, Seq(
      (0L, "a b c", "en", "s0", 5L), (1L, "a b c", "en", "s0", 5L),
      (2L, "a b c", "en", "s0", 5L), (3L, "d e f", "en", "s0", 5L),
      (4L, "g h i", "en", "s0", 5L), (5L, "g h i", "en", "s0", 5L)))
    val r = graft.operators.TextPack.queries("q372_good_turing")(spark, d)
      .collect().map(x => x.getAs[Int]("r") -> x).toMap
    assert(r.keySet == Set(1, 2, 3))
    assert(r(1).getAs[Long]("n_r") == 1L)
    assert(r(1).getAs[Long]("n_r_next") == 1L)
    assert(r(1).getAs[Long]("gt_star_milli") == 2000L)
    assert(r(2).getAs[Long]("gt_star_milli") == 3000L)
    assert(r(3).getAs[Long]("n_r_next") == 0L)
    assert(r(3).getAs[Long]("gt_star_milli") == 0L)
    assert(r(1).getAs[Long]("n_tokens") == 6L)
    assert(r(1).getAs[Long]("p0_ppm") == 166666L)
  }

  test("q374 burstiness fixed point: constant gaps read as sub-exponential") {
    // gaps 60,60,60 s: median=60, mean=60, cv2=0,
    // burst = floor(1000*60*3/(180*ln2)) = floor(1442.695) = 1442
    val d = tmpDir()
    writeEvents(d, (0 until 4).map(i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-01 10:0${i}:00"), 7L, "view", 0.0, "{}")))
    val r = graft.operators.EventsPack.queries("q374_gap_burstiness")(spark, d)
      .collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_gaps") == 3L)
    assert(r(0).getAs[Long]("median_gap_s") == 60L)
    assert(r(0).getAs[Long]("cv2_milli") == 0L)
    assert(r(0).getAs[Long]("burst_milli") == 1442L)
  }

  test("q376 fold 0 equals q120's fixed-split classifier exactly") {
    // q120 trains on doc_id % 5 != 0 and scores fold 0 — exactly
    // q376's leave-own-fold-out run for fold 0, so the count-
    // subtraction cube must reproduce q120's (n_held, n_correct)
    // bit-for-bit on the driver corpus.
    val d = "/root/testdata/sf0.001"
    val cv = graft.operators.TextPack.queries("q376_nb_cv_kfold")(spark, d)
      .filter(org.apache.spark.sql.functions.col("fold") === 0).collect()
    assert(cv.length == 1)
    val q120 = graft.operators.TextPack.queries("q120_nb_classify")(spark, d)
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("correct").as("c"))
      .collect()(0)
    assert(cv(0).getAs[Long]("n_held") == q120.getAs[Long]("n"))
    assert(cv(0).getAs[Long]("n_correct") == q120.getAs[Long]("c"))
  }

  test("JaroWinklerKernel reproduces the textbook values") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val jw = (a: String, b: String) =>
      graft.functions.JaroWinklerKernel.milli(u(a), u(b))
    // Winkler 1990's canonical pairs
    assert(jw("MARTHA", "MARHTA") == 961L) // jaro 17/18, prefix 3
    assert(jw("DIXON", "DICKSONX") == 813L) // jaro 23/30, prefix 2
    assert(jw("abc", "abc") == 1000L)
    assert(jw("", "") == 1000L)
    assert(jw("abc", "") == 0L)
    assert(jw("abc", "xyz") == 0L)
    // below the 0.7 boost threshold the prefix bonus must NOT apply:
    // jaro(ab, ba) has m=0 within the window (bound 0) -> 0
    assert(jw("ab", "ba") == 0L)
    // symmetric
    assert(jw("DIXON", "DICKSONX") == jw("DICKSONX", "DIXON"))
  }

  test("JaroWinkler boundary-gap measures distance to the half-milli rounding edge") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val gap = (a: String, b: String) =>
      graft.functions.JaroWinklerKernel.boundaryGapPpb(u(a), u(b))
    // integer-valued similarities sit a full half milli from any
    // boundary: 0.5 milli = 5e8 ppb
    assert(gap("abc", "abc") == 500000000L)
    assert(gap("", "") == 500000000L)
    assert(gap("abc", "xyz") == 500000000L)
    // MARTHA/MARHTA: exact rational 622800/648 = 961 + 1/9 milli;
    // nearest half boundary is 961.5, distance 0.5 - 1/9 = 7/18 milli
    // = 388,888,888 ppb (floored)
    assert(gap("MARTHA", "MARHTA") == 388888888L)
    // the gap is always <= half a milli and never negative
    val rnd = new scala.util.Random(7)
    def str() = (0 until rnd.nextInt(20))
      .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    Seq.fill(500)((str(), str())).foreach { case (a, b) =>
      val g = gap(a, b)
      assert(g >= 0L && g <= 500000000L, s"gap out of range on ($a, $b): $g")
      // consistency with the rounded value: shifting the exact
      // rational by less than the gap can never change milli()
      assert(g == gap(b, a), "gap asymmetric")
    }
  }

  test("JaroWinkler codegen path agrees with the interpreted kernel on random pairs") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def str() = (0 until rnd.nextInt(20))
      .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val pairs = Seq.fill(300)((str(), str()))
    graft.functions.GraftExpressions.ensure(spark)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.functions.GraftExpressions.jaroWinklerMilli(col("a"), col("b")).as("jw"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (a, b) =>
      val ref = graft.functions.JaroWinklerKernel.milli(u(a), u(b))
      assert(got((a, b)) == ref, s"codegen vs eval diverge on ($a, $b)")
      assert(ref >= 0L && ref <= 1000L)
      assert(ref == graft.functions.JaroWinklerKernel.milli(u(b), u(a)), "asymmetric")
    }
  }

  test("q375 sorted-neighborhood finds transposed mates, misses prefix-damaged ones") {
    // keys 1..12; k%4==0 (4,8,12) get the char-5 prefix deletion and
    // sort before every intact "Customer#..." record — unreachable at
    // w<=3. All other transpositions swap '0' with '0' (identity), so
    // the dirty record is byte-equal to its mate and found at offset 1.
    val d = tmpDir()
    writeCustomers(d, 12)
    val r = graft.operators.CleanPack.queries("q375_sorted_neighborhood")(spark, d)
      .collect().map(x => x.getAs[Int]("k") -> x).toMap
    assert(r.keySet == Set(1, 2, 3))
    assert(r(1).getAs[Long]("n_true_pairs") == 9L)
    assert(r(1).getAs[Long]("cum_found") == 9L)
    assert(r(3).getAs[Long]("cum_found") == 9L) // damage never recovered
    assert(r(3).getAs[Long]("cum_recall_ppm") == 750000L)
    // monotone non-decreasing cumulative recall
    assert(r(1).getAs[Long]("cum_found") <= r(2).getAs[Long]("cum_found"))
    assert(r(2).getAs[Long]("cum_found") <= r(3).getAs[Long]("cum_found"))
  }
}
