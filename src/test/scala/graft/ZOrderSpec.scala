package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftExpressions

/** Model-checks the native Morton interleave (graft_zorder2) against a
  * Scala bit-by-bit reference, and pins the locality property q154's
  * layout story rests on: sorting by z-value groups the top-bits cell
  * (x-top-3, y-top-3) into contiguous runs.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ref(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 21) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("native interleave matches the bit-by-bit reference") {
    GraftExpressions.ensure(spark)
    val rnd = new scala.util.Random(11)
    val rows = Seq((0L, 0L), (255L, 255L), (1L, 0L), (0L, 1L),
      ((1L << 21) - 1, (1L << 21) - 1)) ++
      (1 to 500).map(_ => (rnd.nextInt(1 << 21).toLong, rnd.nextInt(1 << 21).toLong))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), GraftExpressions.zorder2(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z === ref(x, y), s"x=$x y=$y") }
  }

  test("z-sort clusters the 8x8 top-bit grid into contiguous runs") {
    GraftExpressions.ensure(spark)
    val rows = for (x <- 0 until 256 by 3; y <- 0 until 256 by 3) yield (x.toLong, y.toLong)
    val sorted = rows.toDF("x", "y")
      .select(GraftExpressions.zorder2(col("x"), col("y")).as("z"),
        (col("x") / 32).cast("int").as("cx"), (col("y") / 32).cast("int").as("cy"))
      .orderBy("z")
      .as[(Long, Int, Int)].collect()
    // each of the 64 cells must appear as EXACTLY ONE contiguous run
    val runs = sorted.map(r => (r._2, r._3)).foldLeft(List.empty[(Int, Int)]) {
      case (acc, cell) if acc.headOption.contains(cell) => acc
      case (acc, cell) => cell :: acc
    }
    assert(runs.length === 64)
    assert(runs.distinct.length === 64)
  }
}
