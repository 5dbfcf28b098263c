package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.functions.PrefixSum.denseRank]] against the sequential
  * dense_rank definition, including duplicate-heavy and skewed keys
  * (equal keys must co-locate under the range partitioner for the
  * local new-key flag to be sound). */
class DenseRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("matches dense_rank() on skewed two-column keys") {
    import spark.implicits._
    val rows = (0 until 5000).map { i =>
      (i.toLong % 7, (i * i).toLong % 13, i.toLong)
    }
    val df = rows.toDF("k1", "k2", "tb").repartition(8)
    val got = graft.functions.PrefixSum
      .denseRank(df, Seq(col("k1"), col("k2")), Seq(col("tb")), "r")
      .select("k1", "k2", "tb", "r")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2, t._3))
    val distinctKeys = rows.map(t => (t._1, t._2)).distinct.sorted
    val rankOf = distinctKeys.zipWithIndex.map { case (k, i) => k -> (i + 1L) }.toMap
    val want = rows.sortBy(t => (t._1, t._2, t._3))
      .map(t => (t._1, t._2, t._3, rankOf((t._1, t._2))))
    assert(got.toSeq === want)
  }

  test("all-equal keys rank 1; all-distinct keys rank 1..n") {
    import spark.implicits._
    val same = (1 to 100).map(i => (1L, i.toLong)).toDF("k", "tb")
    val gotSame = graft.functions.PrefixSum
      .denseRank(same, Seq(col("k")), Seq(col("tb")), "r")
      .select("r").collect().map(_.getLong(0)).toSet
    assert(gotSame === Set(1L))
    val distinct = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("k", "tb")
    val gotD = graft.functions.PrefixSum
      .denseRank(distinct, Seq(col("k")), Seq(col("tb")), "r")
      .select("k", "r").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(gotD.toSeq === (1 to 100).map(i => (i.toLong, i.toLong)))
  }
}
