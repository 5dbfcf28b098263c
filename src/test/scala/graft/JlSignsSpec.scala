package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q324's Johnson–Lindenstrauss sign matrix: the projection's variance
  * argument needs (a) every entry exactly ±1, (b) determinism (the
  * DuckDB oracle replays the same md5 parities), and (c) no gross
  * imbalance (an all-+1 row would make the "random" projection a plain
  * coordinate sum). */
class JlSignsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("sign matrix is ±1, complete, deterministic, and balanced") {
    val r = 16
    val df = graft.operators.SimilarityPack.jlSigns(spark, r)
    val rows = df.collect().map(x => (x.getInt(0), x.getInt(1), x.getLong(2)))
    assert(rows.length == r * 64)
    assert(rows.map(t => (t._1, t._2)).toSet.size == r * 64)
    assert(rows.forall(t => t._3 == 1L || t._3 == -1L))
    // md5 parity is near-uniform: the global sum of 1024 ±1 draws
    // concentrates around 0 (this is a FIXED matrix — the bound just
    // documents it is not degenerate)
    assert(math.abs(rows.map(_._3).sum) < 200)
    // per-projection rows are not constant
    val perRow = rows.groupBy(_._2).map { case (_, g) => g.map(_._3).toSet }
    assert(perRow.forall(_.size == 2))
    val again = graft.operators.SimilarityPack.jlSigns(spark, r)
      .collect().map(x => (x.getInt(0), x.getInt(1), x.getLong(2)))
    assert(rows.sortBy(t => (t._1, t._2)).toSeq ==
      again.sortBy(t => (t._1, t._2)).toSeq)
  }
}
