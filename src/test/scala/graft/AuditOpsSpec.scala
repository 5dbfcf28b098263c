package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

/** Closed-form fixtures for the audit/funnel operators added late in
  * round 6:
  *   - q216 t-closeness: a segment identical to the global distribution
  *     scores EMD 0; a fully-shifted segment scores the hand-computed
  *     maximum for its split;
  *   - q219 timeout funnel: events exactly AT the 7-day boundary count,
  *     one microsecond past it do not — the inclusive-bound contract;
  *   - q218 FD validation: an injected violation is counted with its
  *     degree.
  */
class AuditOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("q216: identical-distribution segment scores EMD 0, shifted segment the closed form") {
    val tmp = Files.createTempDirectory("graft-tc").toString
    // bins are fixed-width over [min,max] cents split into 10.
    // SEG_LO: all at min; SEG_HI: all at max; SEG_MIX: half min, half max
    // global: 20 at min, 20 at max → cum_all = (20,...,20,40)/40
    val rows =
      (1 to 10).map(i => (i.toLong, s"c$i", 0, "SEG_LO", 0.00)) ++
      (11 to 20).map(i => (i.toLong, s"c$i", 0, "SEG_HI", 90.00)) ++
      (21 to 30).map(i => (i.toLong, s"c$i", 0, "SEG_MIX", 0.00)) ++
      (31 to 40).map(i => (i.toLong, s"c$i", 0, "SEG_MIX", 90.00))
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    val r = SparkEntry.queries("q216_t_closeness")(spark, tmp)
      .as[(String, Long, Long)].collect().toMap2
    // global per bin: bin0=20, bin9=20 of N=40. SEG_MIX matches global
    // exactly (10/10 of 20) → every |cum_g·N − cum_all·n_g| = 0.
    assert(r("SEG_MIX") === (20L, 0L))
    // SEG_LO (all mass in bin 0, n_g=10): bins 0..8 each contribute
    // |10·40 − 20·10| = 200; bin 9 contributes 0 → raw = 1800;
    // emd_q = 1e6·1800 / (10·40·9) = 500000 (= EMD ½, the true shift)
    assert(r("SEG_LO") === (10L, 500000L))
    assert(r("SEG_HI") === (10L, 500000L))
  }

  private implicit class ToMap2(rows: Array[(String, Long, Long)]) {
    def toMap2: Map[String, (Long, Long)] =
      rows.map(t => t._1 -> ((t._2, t._3))).toMap
  }

  test("q219: the 7-day step window is inclusive at the boundary, exclusive past it") {
    val tmp = Files.createTempDirectory("graft-fn").toString
    val d0 = 1700000000000L
    val wkMs = 7L * 86400000L
    def ev(id: Long, u: Long, ty: String, tMs: Long) =
      (id, new Timestamp(tMs), u, ty, 1.0, "{}")
    val rows = Seq(
      // user 1: view exactly 7 d after signup (counts), purchase exactly
      // 7 d after the view (counts)
      ev(1, 1, "signup", d0), ev(2, 1, "view", d0 + wkMs),
      ev(3, 1, "purchase", d0 + 2 * wkMs),
      // user 2: view 7 d + 1 ms after signup (does NOT count)
      ev(4, 2, "signup", d0), ev(5, 2, "view", d0 + wkMs + 1),
      // user 3: signup only
      ev(6, 3, "signup", d0),
      // user 4: view BEFORE signup (does not count)
      ev(7, 4, "view", d0 - 1000), ev(8, 4, "signup", d0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = SparkEntry.queries("q219_timeout_funnel")(spark, tmp)
      .as[(Long, Long, Long, Long, Long)].collect().head
    // 4 signups, 1 view within window, 1 purchase within window
    assert(r === ((4L, 1L, 1L, 250000L, 1000000L)))
  }

  test("q218: an injected FD violation is counted with its degree") {
    val tmp = Files.createTempDirectory("graft-fd").toString
    // nation: key 1 maps to TWO regions (violation, degree 2); 2 is clean
    Seq((1, "A", 10), (1, "A2", 11), (2, "B", 10))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/nation.parquet")
    // minimal clean side tables for the other FDs
    Seq((1L, "p", "BR", "TY", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/part.parquet")
    Seq((1L, "c", 0, "S", 0.0))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    Seq((1L, new Timestamp(1700000000000L), 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    Seq((1L, 1L, "O", 1.0, new Timestamp(1700000000000L), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val r = SparkEntry.queries("q218_fd_profile")(spark, tmp)
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r("nation_to_region") === ((2L, 1L, 2L)))
    assert(r("brand_to_type") === ((1L, 0L, 1L)))
  }
}
