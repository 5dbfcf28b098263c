package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.core.QueryPack

/** Plan-shape regression gate: PLANS.md is the human-reviewable record of
  * the headline physical plans, but a review is only as good as the last
  * time someone ran it. This spec pins the structural properties the
  * review checks for — pushdown reaching the scan, dims broadcasting,
  * top-k compiling to TakeOrderedAndProject, and (the 100 TB invariant)
  * no cartesian/nested-loop join ever appearing on a scale path — so a
  * plan regression fails CI instead of waiting for a human to re-read
  * PLANS.md.
  *
  * Plans are inspected at planning time (the pre-execution AQE plan):
  * explicit broadcasts, TakeOrderedAndProject, scan pushdown, and join
  * strategy choices for labeled-size sides are all visible there.
  */
class PlanShapeSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  override def beforeAll(): Unit = { QueryPack.planDumpMode = true }
  override def afterAll(): Unit = { QueryPack.planDumpMode = false }

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q10: filters and projection are pushed into the parquet scan") {
    val p = plan("q10_filter_project")
    assert(p.contains("PushedFilters: ["), s"no PushedFilters block:\n${p.take(1200)}")
    assert(!p.contains("PushedFilters: []"),
      s"pushdown list is empty — filters stayed above the scan:\n${p.take(1200)}")
  }

  test("q12: dims broadcast and top-k is TakeOrderedAndProject") {
    val p = plan("q12_join_hash_topk")
    assert(p.contains("BroadcastHashJoin"), s"dim join not broadcast:\n${p.take(1500)}")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k did not compile to TakeOrderedAndProject:\n${p.take(1500)}")
  }

  test("q13: explicit broadcast join stays a BroadcastHashJoin") {
    val p = plan("q13_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("q24: global top-k is TakeOrderedAndProject, not sort+limit") {
    val p = plan("q24_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("scale-path dedup/ANN plans contain no cartesian or nested-loop join") {
    // q44/q50 are the two labeled brute-force ground-truth baselines and
    // the only queries allowed a non-equi join of two unbounded sides.
    // q53/q54 carry a crossJoin against a BROADCAST centroid/denominator
    // frame (tiny by construction) — nested-loop against a broadcast
    // 1-row/√N-row side is the intended plan there, so they assert only
    // the absence of CartesianProduct (both-sides-shuffled).
    val equiOnly = Seq("q41_dedup_minhash", "q42_dedup_simhash", "q43_dedup_ngram",
      "q45_dedup_embedding_lsh", "q49_contamination", "q51_ann_lsh",
      "q52_ann_multiprobe", "q56_range_join", "q74_phash_neardup")
    equiOnly.foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name: CartesianProduct on a scale path")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$name: nested-loop join on a scale path")
      spark.catalog.clearCache()
    }
    val broadcastCrossOk = Seq("q53_ann_ivf", "q54_ann_recall", "q103_ann_ivfpq")
    broadcastCrossOk.foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"),
        s"$name: CartesianProduct — the cross join lost its broadcast side")
      spark.catalog.clearCache()
    }
  }
}
