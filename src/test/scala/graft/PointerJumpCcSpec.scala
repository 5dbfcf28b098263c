package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PipelinePack

/** Cross-check of the two connected-components implementations:
  * [[PipelinePack.pointerJumpCC]] (hook + pointer-jumping compress,
  * O(log n) rounds) must produce EXACTLY the label table of
  * [[PipelinePack.connectedComponents]] (BSP neighbor-min, O(diameter)
  * rounds) on adversarial shapes — long chains (worst case for BSP,
  * best case to expose jump bugs), stars, disjoint cliques, isolated
  * self-edges, and seeded random graphs. Labels are component minima in
  * both, so equality is exact, not up-to-relabeling.
  */
class PointerJumpCcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ccBoth(edges: Seq[(Long, Long)]): (Map[Long, Long], Map[Long, Long]) = {
    import spark.implicits._
    // symmetric closure, as every caller feeds these functions
    val e = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("v", "u")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (toMap(PipelinePack.connectedComponents(e)),
      toMap(PipelinePack.pointerJumpCC(e)))
  }

  test("chain of 40 nodes (BSP worst case) — identical labels") {
    val (bsp, pj) = ccBoth((0L until 39L).map(i => (i, i + 1)))
    assert(pj == bsp)
    assert(pj.values.toSet == Set(0L))
  }

  test("disjoint cliques + star + isolated self-loop — identical labels") {
    val clique = for (a <- 10L to 14L; b <- 10L to 14L if a < b) yield (a, b)
    val star = (1L to 5L).map(i => (20L, 20L + i))
    val selfLoop = Seq((99L, 99L))
    val (bsp, pj) = ccBoth(clique ++ star ++ selfLoop)
    assert(pj == bsp)
    assert(pj(14L) == 10L && pj(25L) == 20L && pj(99L) == 99L)
  }

  test("seeded random graphs — identical labels") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 30 + trial * 10
      val edges = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val (bsp, pj) = ccBoth(edges)
      assert(pj == bsp, s"trial $trial diverged")
    }
  }

  test("incremental star+delta recompute equals full CC on random graphs (q224's identity)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 40 + trial * 20
      val edges = Seq.fill(2 * n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      // random ~20% delta slice standing in for the newest ingest
      val (delta, base) = edges.partition(_ => rnd.nextInt(5) == 0)
      if (base.nonEmpty && delta.nonEmpty) {
        def sym(es: Seq[(Long, Long)]) =
          es.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("v", "u")
        val stored = PipelinePack.pointerJumpCC(sym(base)).collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        val starPlusDelta = stored.toSeq ++ delta
        val incremental = PipelinePack.pointerJumpCC(sym(starPlusDelta))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val full = PipelinePack.connectedComponents(sym(edges))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(incremental == full, s"trial $trial incremental != full")
      }
    }
  }
}
