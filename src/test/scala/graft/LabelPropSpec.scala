package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PipelinePack

/** Model-checks [[PipelinePack.labelProp]] against an independent
  * in-memory implementation of the same synchronous rule (most frequent
  * neighbor label, ties to the smallest) on seeded random graphs — the
  * union-find precedent from ConnectedComponentsSpec — and pins the
  * qualitative property CC cannot give: two cliques joined by one
  * bridge edge resolve to TWO communities.
  */
class LabelPropSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The same synchronous update, straight-line Scala. */
  private def model(sym: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val adj = sym.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var lab: Map[Long, Long] = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      lab = adj.map { case (u, neigh) =>
        val best = neigh.map(lab).groupBy(identity).toSeq
          .map { case (l, occ) => (-occ.size.toLong, l) }
          .minBy(identity)
        u -> best._2
      }
    }
    lab
  }

  private def run(sym: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
    PipelinePack.labelProp(sym.toDF("v", "u"), rounds)
      .as[(Long, Long)].collect().toMap

  test("matches the in-memory model on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 8) {
      val n = 4 + rnd.nextInt(8)
      val dir = for {
        a <- 0L until n.toLong; b <- (a + 1) until n.toLong
        if rnd.nextDouble() < 0.35
      } yield (a, b)
      if (dir.nonEmpty) {
        val sym = dir ++ dir.map(_.swap)
        assert(run(sym, 4) === model(sym, 4), s"graph: $dir")
      }
    }
    spark.catalog.clearCache()
  }

  test("two bridged cliques resolve to two communities") {
    val cl1 = for { a <- 0L to 3L; b <- 0L to 3L if a != b } yield (a, b)
    val cl2 = for { a <- 10L to 13L; b <- 10L to 13L if a != b } yield (a, b)
    val sym = cl1 ++ cl2 ++ Seq((3L, 10L), (10L, 3L))
    val lab = run(sym, 4)
    assert(lab.filterKeys(_ <= 3L).values.toSet.size === 1)
    assert(lab.filterKeys(_ >= 10L).values.toSet.size === 1)
    assert(lab(0L) !== lab(13L))
    spark.catalog.clearCache()
  }
}
