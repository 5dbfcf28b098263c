package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed pins for the AnalyticsPack estimators: the md5-bit
  * geometric ladder against a bit-twiddling reference, Kruskal–Wallis
  * and Kendall τ-b on textbook-sized examples, and the EWMA / STL
  * decompositions' constant-series fixed points (weights normalize ⇒ a
  * constant signal is its own smooth, with zero seasonal/residual).
  */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_analytics_spec").toString

  private def writeDocs(dir: String, rows: Seq[(Long, String, String, String, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  /** One orders row per (month index, sequence) with the given price. */
  private def writeOrders(dir: String, rows: Seq[(Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((moi, _, price), i) =>
      val y = 1995 + (moi / 12); val m = 1 + (moi % 12)
      (i.toLong, 1L, "F", price,
        Timestamp.valueOf(f"$y%04d-$m%02d-01 00:00:00"), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
  }

  test("trailingOnesCase matches the bit-twiddling reference") {
    import spark.implicits._
    val hs = (0L to 2048L) ++ Seq.tabulate(17)(k => (1L << k) - 1) ++
      Seq(Long.MaxValue, 123456789L)
    val got = hs.toDF("h")
      .withColumn("t", expr(graft.operators.AnalyticsPack.trailingOnesCase("h")))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    hs.foreach { h =>
      val ref = math.min(java.lang.Long.numberOfTrailingZeros(~h), 16)
      assert(got(h) == ref, s"h=$h")
    }
  }

  test("Kruskal-Wallis reproduces the textbook two-group example") {
    // src0 = {1,2}, src1 = {3,4}: ranks 1..4, H = 12/(4*5)*(9/2+49/2)-15 = 2.4
    val d = tmpDir()
    writeDocs(d, Seq((0L, "a", "en", "src0", 1L), (1L, "a", "en", "src0", 2L),
      (2L, "a", "en", "src1", 3L), (3L, "a", "en", "src1", 4L)))
    val r = graft.operators.AnalyticsPack.queries("q351_kruskal_wallis")(spark, d)
      .orderBy("source").collect()
    assert(r.length == 2)
    assert(r(0).getAs[Long]("h_milli") == 2400L)
    assert(r(0).getAs[Long]("h_tie_milli") == 2400L)
    assert(r(0).getAs[Long]("crit_milli") == 3841L) // df = 1
    assert(!r(0).getAs[Boolean]("reject"))
  }

  test("Kendall tau-b on a 3-month example with one discordant pair") {
    // volumes x = (1,2,3), revenue y = (1000,3000,2000) cents:
    // C=2, D=1, no ties -> tau = 1/3 -> 333 milli
    val d = tmpDir()
    writeOrders(d, Seq((0L, "a", 10.0),
      (1L, "a", 10.0), (1L, "b", 20.0),
      (2L, "a", 5.0), (2L, "b", 5.0), (2L, "c", 10.0)))
    val r = graft.operators.AnalyticsPack.queries("q352_kendall_monthly")(spark, d)
      .collect().head
    assert(r.getAs[Long]("n_months") == 3L)
    assert(r.getAs[Long]("n_concordant") == 2L)
    assert(r.getAs[Long]("n_discordant") == 1L)
    assert(r.getAs[Long]("ties_x") == 0L && r.getAs[Long]("ties_y") == 0L)
    assert(r.getAs[Long]("tau_b_milli") == 333L)
  }

  test("EWMA of a constant series is the constant, with zero forecast error") {
    val d = tmpDir()
    // 40 months, 3 orders each: weights renormalize to 1 in every window
    writeOrders(d, for (m <- 0L until 40L; j <- Seq("a", "b", "c"))
      yield (m, j, 10.0))
    val r = graft.operators.AnalyticsPack.queries("q354_ewma_forecast")(spark, d)
      .collect()
    assert(r.length == 40)
    assert(r.forall(_.getAs[Long]("ewma_milli") == 3000L))
    assert(r.filter(_.getAs[Long]("next_actual") >= 0)
      .forall(_.getAs[Long]("abs_err_milli") == 0L))
  }

  test("STL decomposition of a constant series has zero seasonal and residual") {
    val d = tmpDir()
    writeOrders(d, for (m <- 0L until 30L; j <- Seq("a", "b")) yield (m, j, 10.0))
    val r = graft.operators.AnalyticsPack.queries("q360_stl_decomposition")(spark, d)
      .collect()
    assert(r.length == 18) // 30 months minus 6 edge months each side
    assert(r.forall(_.getAs[Long]("trend_milli") == 2000L))
    assert(r.forall(_.getAs[Long]("seas_milli") == 0L))
    assert(r.forall(_.getAs[Long]("resid_milli") == 0L))
  }
}
