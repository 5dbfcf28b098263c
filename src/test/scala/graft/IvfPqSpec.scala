package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the IVF-PQ composite (q103) beyond the dual-engine
  * gate: the cell pruning is REAL — every returned neighbor's home cell
  * must be one of its query's probed cells (nothing outside the probe
  * set can leak into the result) — and ranks are dense per query with
  * the exact re-rank cosine descending.
  */
class IvfPqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = SparkTestSession.sfDir

  test("every q103 hit lies in one of its query's probed IVF cells") {
    val hits = SparkEntry.queries("q103_ann_ivfpq")(spark, dir)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSeq
    assert(hits.nonEmpty)
    spark.catalog.clearCache()
    // home cell of every vector: q102's output carries the arn=1
    // assignment of the same deterministically-trained model
    val cellOf = SparkEntry.queries("q102_semdedup")(spark, dir)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    spark.catalog.clearCache()
    // exact probe universe from the trained model (test hook)
    val probed = graft.operators.SimilarityPack.probeMap(spark, dir)
      .as[(Long, Int)].collect().toSet
    spark.catalog.clearCache()
    hits.foreach { case (q, hit) =>
      assert(probed.contains((q, cellOf(hit))),
        s"q=$q hit=$hit home cell ${cellOf(hit)} was not probed")
    }
  }

  test("ranks are dense per query and exact cosine descends with rank") {
    val rows = SparkEntry.queries("q103_ann_ivfpq")(spark, dir)
      .select($"q_id", $"rk", $"vec_id", $"cosine")
      .as[(Long, Int, Long, Double)].collect().toSeq
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted === (1 to rs.size), s"ranks of q=$q")
      assert(rs.size <= 5)
      assert(!rs.exists(_._3 == q), s"self-match in q=$q")
      val byRank = rs.sortBy(_._2).map(_._4)
      assert(byRank === byRank.sorted.reverse, s"cosine not descending, q=$q")
    }
  }
}
