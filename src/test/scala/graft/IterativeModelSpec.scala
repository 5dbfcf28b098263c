package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

import graft.operators.PipelinePack

/** The two BSP-iterative operators checked against independent
  * in-memory models on random graphs — beyond the fixed-shape specs:
  *
  *   - connectedComponents vs union-find
  *   - pageRank vs a direct evaluation of the same integer recurrence
  *     (which is deterministic by construction, so model equality is
  *     exact, not approximate).
  */
class IterativeModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  // random undirected edge lists over up to 40 nodes, including
  // long chains (the shapes that broke fixed-round propagation)
  private val edgesGen: Gen[List[(Long, Long)]] = for {
    nEdges <- Gen.choose(0, 60)
    es <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(0L, 39L); b <- Gen.choose(0L, 39L) if a != b
    } yield (a, b))
    chainLen <- Gen.choose(0, 20)
    base <- Gen.choose(100L, 200L)
  } yield es ++ (0 until chainLen).map(i => (base + i, base + i + 1))

  private def symmetric(es: Seq[(Long, Long)]): Seq[(Long, Long)] =
    es ++ es.map { case (a, b) => (b, a) }

  test("connectedComponents equals union-find on random graphs") {
    import spark.implicits._
    samples(edgesGen, 12).filter(_.nonEmpty).foreach { es =>
      val sym = symmetric(es)
      val spark_ = PipelinePack.connectedComponents(sym.toDF("v", "u"))
        .as[(Long, Long)].collect().toMap
      // union-find model
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = sym.map(_._1).distinct
      val model = nodes.map { v =>
        // label = min node id of the component
        val root = find(v)
        v -> nodes.filter(u => find(u) == root).min
      }.toMap
      assert(spark_ == model, s"CC mismatch on ${es.take(10)}...")
    }
  }

  test("pageRank equals the direct integer recurrence on random graphs") {
    import spark.implicits._
    samples(edgesGen, 8).filter(_.nonEmpty).foreach { es =>
      val sym = symmetric(es)
      val rounds = 5
      val spark_ = PipelinePack.pageRank(sym.toDF("v", "u"), rounds)
        .as[(Long, Long)].collect().toMap
      // direct model of the exact same integer recurrence
      val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      var score = deg.keys.map(_ -> 1000000L).toMap
      for (_ <- 1 to rounds) {
        val recv = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
        sym.foreach { case (v, u) => recv(u) += score(v) / deg(v) }
        score = recv.map { case (u, s) => u -> (150000L + (85L * s) / 100L) }.toMap
      }
      assert(spark_ == score, s"PageRank mismatch on ${es.take(10)}...")
    }
  }
}
