package graft

import org.scalatest.funsuite.AnyFunSuite

/** Exact in-memory transcriptions of q175's fixed-point power iteration
  * and q174's label-excluded neighbor ranking — every integer step
  * (quantization, sign-split rescales, the one sqrt/divide/floor) is
  * replayed and must match the distributed plans bit-for-bit.
  */
class PowerIterationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val vecs: Seq[(Long, Array[Float], Long)] =
    spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
      .selectExpr("vec_id", "embedding", "CAST(label AS BIGINT)")
      .as[(Long, Array[Float], Long)].collect().toSeq.sortBy(_._1)

  private def quant(x: Array[Float]): Array[Long] =
    x.map(f => math.floor(f.toDouble * 1e6).toLong)

  private def signDiv(a: Long, b: Long): Long =
    if (a >= 0) a / b else -((-a) / b)

  test("q175 equals the exact fixed-point model") {
    val q = vecs.map { case (_, e, _) => quant(e) }
    val dim = q.head.length
    var v = Array.fill(dim)(1000000L)
    for (_ <- 1 to 3) {
      val ys = q.map(row => signDiv(row.indices.map(j => row(j) * v(j)).sum, 1000000L))
      val s = Array.tabulate(dim)(j => q.indices.map(i => q(i)(j) * ys(i)).sum)
      val sd = s.map(signDiv(_, 10000000000L))
      val n2 = sd.map(x => x * x).sum
      v = sd.map(x =>
        if (n2 == 0) 0L
        else math.floor(x.toDouble / math.sqrt(n2.toDouble) * 1e6).toLong)
    }
    val got = SparkEntry.queries("q175_power_iteration")(spark, SparkTestSession.sfDir)
      .as[(Int, Long)].collect().sortBy(_._1).map(_._2).toSeq
    assert(got === v.toSeq)
    assert(got.exists(_ != 0L))
    spark.catalog.clearCache()
  }

  test("q174 equals the brute-force label-excluded ranking") {
    val scored = vecs.map { case (id, e, lab) =>
      val qv = quant(e)
      val norm = math.sqrt(qv.map(x => x * x).sum.toDouble / 1e12)
      (id, lab, qv, norm)
    }
    val expected = scored.filter(_._1 < 5).flatMap { case (qid, qlab, qq, qnorm) =>
      scored.filter { case (id, lab, _, _) => id != qid && lab != qlab }
        .map { case (id, lab, cq, cnorm) =>
          val dot = qq.indices.map(j => qq(j) * cq(j)).sum.toDouble / 1e12
          (id, lab, dot / (qnorm * cnorm))
        }
        .sortBy { case (id, _, cos) => (-cos, id) }
        .take(5).zipWithIndex
        .map { case ((id, lab, cos), i) => (qid, qlab, i + 1, id, lab, cos) }
    }.sortBy(r => (r._1, r._3))
    val got = SparkEntry.queries("q174_hard_negatives")(spark, SparkTestSession.sfDir)
      .as[(Long, Long, Int, Long, Long, Double)].collect().toSeq
    assert(got === expected)
    got.foreach { case (_, qlab, _, _, neglab, _) => assert(qlab != neglab) }
    spark.catalog.clearCache()
  }
}
