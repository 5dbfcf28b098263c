package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{AsOfJoinExec, GraftOps}

/** The native as-of join (AsOfJoinPlan → AsOfJoinStrategy → AsOfJoinExec)
  * against a brute-force theta-join + argmax oracle, plus plan-shape and
  * edge-case pins.
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Brute force: join on key, keep rt <= lt (or <), argmax rt per left
    * row; a tolerance then VALIDATES the winner (no fallback). */
  private def brute(
      left: DataFrame, right: DataFrame,
      allowEqual: Boolean, leftOuter: Boolean,
      tol: Option[Long] = None): Seq[(Long, Long, Option[Long])] = {
    val l = left.select($"k".as("lk"), $"lid", $"lt").as[(Long, Long, Long)].collect()
    val r = right.select($"rk", $"rt").as[(Long, Long)].collect()
    val matchedAll = l.toSeq.map { case (lk, lid, lt) =>
      val cands = r.filter { case (rk, rt) =>
        rk == lk && (if (allowEqual) rt <= lt else rt < lt)
      }
      val best = if (cands.isEmpty) None else Some(cands.map(_._2).max)
      (lk, lid, best.filter(b => tol.forall(t => lt - b <= t)))
    }
    if (leftOuter) matchedAll else matchedAll.filter(_._3.nonEmpty)
  }

  private def native(
      left: DataFrame, right: DataFrame,
      allowEqual: Boolean, leftOuter: Boolean,
      tol: Option[Long] = None): Seq[(Long, Long, Option[Long])] = {
    GraftOps.asofJoin(left, right, Seq("k"), Seq("rk"), "lt", "rt",
        allowEqual = allowEqual, leftOuter = leftOuter, tolerance = tol)
      .select($"k", $"lid", $"rt")
      .as[(Long, Long, Option[Long])].collect().toSeq
  }

  private def mkLeft(rows: Seq[(Long, Long, Long)]): DataFrame =
    rows.toDF("k", "lid", "lt")
  private def mkRight(rows: Seq[(Long, Long)]): DataFrame =
    rows.toDF("rk", "rt").withColumnRenamed("rk", "k")
      .select($"k".as("rk"), $"rt") // distinct column names from the left side

  test("property: matches brute-force argmax on random data (all 4 modes)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 8) {
      val nKeys = 1 + rnd.nextInt(12)
      val left = mkLeft(Seq.fill(60 + rnd.nextInt(120))(
        (rnd.nextInt(nKeys).toLong, rnd.nextLong().abs % 100000, rnd.nextInt(100).toLong)))
      // distinct (key, time) on the right: ties there are documented as
      // unspecified, so the oracle only covers the deduplicated case
      val right = mkRight(Seq.fill(40 + rnd.nextInt(80))(
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(100).toLong)).distinct)
      for (eq <- Seq(true, false); outer <- Seq(true, false);
           tol <- Seq(None, Some(7L), Some(40L))) {
        val expect = brute(left, right, eq, outer, tol).sorted
        val got = native(left, right, eq, outer, tol).sorted
        assert(got === expect,
          s"trial=$trial allowEqual=$eq leftOuter=$outer tol=$tol")
      }
    }
  }

  test("keys with no right rows stay unmatched (no cross-key leakage)") {
    // key 1 has right rows, key 2 has none; a stale buffered match from
    // key 1 must not leak into key 2
    val left = mkLeft(Seq((1L, 1L, 50L), (2L, 2L, 50L)))
    val right = mkRight(Seq((1L, 10L)))
    assert(native(left, right, true, false) === Seq((1L, 1L, Some(10L))))
    assert(native(left, right, true, true).sorted ===
      Seq((1L, 1L, Some(10L)), (2L, 2L, None)))
  }

  test("allowEqual toggles the boundary row") {
    val left = mkLeft(Seq((1L, 1L, 10L)))
    val right = mkRight(Seq((1L, 10L), (1L, 5L)))
    assert(native(left, right, true, false) === Seq((1L, 1L, Some(10L))))
    assert(native(left, right, false, false) === Seq((1L, 1L, Some(5L))))
  }

  test("null keys and null times match nothing") {
    val left = Seq[(java.lang.Long, java.lang.Long, java.lang.Long)](
      (null, 1L, 10L), (1L, 2L, null), (1L, 3L, 10L))
      .toDF("k", "lid", "lt")
    val right = Seq[(java.lang.Long, java.lang.Long)](
      (1L, null), (null, 5L), (1L, 7L))
      .toDF("rk", "rt")
    val inner = GraftOps.asofJoin(left, right, Seq("k"), Seq("rk"), "lt", "rt")
      .select($"lid", $"rt").as[(Long, Option[Long])].collect().toSeq
    assert(inner === Seq((3L, Some(7L))))
    val outer = GraftOps.asofJoin(left, right, Seq("k"), Seq("rk"), "lt", "rt",
        leftOuter = true)
      .select($"lid", $"rt").as[(Long, Option[Long])].collect().toSeq.sorted
    assert(outer === Seq((1L, None), (2L, None), (3L, Some(7L))))
  }

  test("tolerance validates the latest match without falling back") {
    val left = mkLeft(Seq((1L, 1L, 100L), (1L, 2L, 10L)))
    val right = mkRight(Seq((1L, 5L), (1L, 90L)))
    // lags: lid 1 -> 10 (match 90), lid 2 -> 5 (match 5)
    assert(native(left, right, true, false, Some(15L)).sorted ===
      Seq((1L, 1L, Some(90L)), (1L, 2L, Some(5L))))
    // tol 8: lid 1's latest match is 10 stale -> row DROPPED, not matched
    // to the even-staler 5
    assert(native(left, right, true, false, Some(8L)) ===
      Seq((1L, 2L, Some(5L))))
    assert(native(left, right, true, true, Some(8L)).sorted ===
      Seq((1L, 1L, None), (1L, 2L, Some(5L))))
  }

  test("empty right side: inner empty, outer all-null") {
    val left = mkLeft(Seq((1L, 1L, 10L), (2L, 2L, 20L)))
    val right = mkRight(Seq.empty)
    assert(native(left, right, true, false).isEmpty)
    assert(native(left, right, true, true).sorted ===
      Seq((1L, 1L, None), (2L, 2L, None)))
  }

  test("multi-column keys") {
    val left = Seq((1L, "a", 1L, 10L), (1L, "b", 2L, 10L))
      .toDF("k1", "k2", "lid", "lt")
    val right = Seq((1L, "a", 5L), (1L, "b", 7L), (1L, "a", 20L))
      .toDF("rk1", "rk2", "rt")
    val got = GraftOps.asofJoin(left, right,
        Seq("k1", "k2"), Seq("rk1", "rk2"), "lt", "rt")
      .select($"lid", $"rt").as[(Long, Long)].collect().toSeq.sorted
    assert(got === Seq((1L, 5L), (2L, 7L)))
  }

  test("self-join (both sides from one scan) re-aliases cleanly") {
    val ev = Tables()
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
    val signups = ev.filter($"event_type" === "signup")
      .select($"user_id".as("r_user_id"), unix_micros($"ts").as("signup_us"))
      .distinct()
    val joinedRows = GraftOps.asofJoin(purchases, signups,
        Seq("user_id"), Seq("r_user_id"), "us", "signup_us")
      .count()
    assert(joinedRows > 0)
  }

  test("plan shape: AsOfJoinExec with clustered exchanges and sorts") {
    val left = mkLeft(Seq((1L, 1L, 10L)))
    val right = mkRight(Seq((1L, 5L)))
    // AQE wraps finished stages in leaf QueryStage nodes that collect()
    // can't descend through — pin the static plan shape instead
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val (plan, execs) = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = GraftOps.asofJoin(left, right, Seq("k"), Seq("rk"), "lt", "rt")
      df.collect()
      val executed = df.queryExecution.executedPlan
      (executed.toString, executed.collect { case e: AsOfJoinExec => e })
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    assert(plan.contains("AsOfJoin"), plan)
    assert(execs.nonEmpty)
    // both children hash-partitioned on the keys and sorted (key, time)
    assert(plan.contains("hashpartitioning"), plan)
    assert(plan.toLowerCase.contains("sort"), plan)
  }

  private def Tables(): DataFrame =
    graft.core.Tables.events(spark, SparkTestSession.sfDir)
}
