package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the PQ (asymmetric-distance) ANN search beyond the
  * dual-engine gate: output shape, distance monotonicity, and integer
  * exactness invariants.
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val rows =
    SparkEntry.queries("q06_ann_pq")(spark, SparkTestSession.sfDir)
      .select($"q_id", $"rk", $"vec_id", $"adist_q")
      .as[(Long, Int, Long, Long)].collect().toSeq

  test("exactly topK ranked neighbors per query, no self-matches") {
    val perQuery = rows.groupBy(_._1)
    assert(perQuery.nonEmpty)
    perQuery.foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted === (1 to rs.size), s"ranks of q=$q")
      assert(rs.size <= 5)
      assert(!rs.exists(_._3 == q), s"self-match in q=$q")
    }
  }

  test("approximate distances are non-negative and ascend with rank") {
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_._2).map(_._4)
      assert(byRank.forall(_ >= 0L), s"negative sq-L2 for q=$q")
      assert(byRank === byRank.sorted, s"adist not ascending with rank, q=$q")
    }
  }
}
