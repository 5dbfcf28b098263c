package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the native Hilbert index ([[graft.functions.HilbertIndex2]]):
  * bijectivity over the order-8 grid, the DEFINING adjacency property
  * (consecutive indices are Manhattan-distance-1 grid neighbors — the
  * guarantee Morton lacks, pinned by contrast), agreement with an
  * independent reference xy2d, and interpreted-vs-codegen agreement.
  */
class HilbertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Independent reference: textbook xy2d with explicit reflect+swap. */
  private def refXy2d(x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L; var s = 128L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  private def evalHilbert(x: Long, y: Long): Long =
    graft.functions.HilbertIndex2(
      org.apache.spark.sql.catalyst.expressions.Literal(x),
      org.apache.spark.sql.catalyst.expressions.Literal(y))
      .eval(null).asInstanceOf[Long]

  test("bijective over the 256x256 grid and matches the reference xy2d") {
    val idx = for (x <- 0L until 256L; y <- 0L until 256L) yield {
      val d = evalHilbert(x, y)
      assert(d === refXy2d(x, y), s"mismatch at ($x, $y)")
      d
    }
    assert(idx.sorted === (0L until 65536L))
  }

  test("consecutive Hilbert indices are always grid neighbors; Morton's are not") {
    val cells = (for (x <- 0L until 256L; y <- 0L until 256L)
      yield (evalHilbert(x, y), x, y)).sortBy(_._1)
    val jumps = cells.sliding(2).count { case Seq(a, b) =>
      math.abs(a._2 - b._2) + math.abs(a._3 - b._3) != 1
    }
    assert(jumps === 0, s"$jumps non-adjacent Hilbert steps")
    def morton(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val mCells = (for (x <- 0L until 256L; y <- 0L until 256L)
      yield (morton(x, y), x, y)).sortBy(_._1)
    val mJumps = mCells.sliding(2).count { case Seq(a, b) =>
      math.abs(a._2 - b._2) + math.abs(a._3 - b._3) != 1
    }
    assert(mJumps > 0, "Morton unexpectedly adjacency-preserving")
  }

  test("codegen path agrees with interpreted eval") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftExpressions.ensure(spark)
    import spark.implicits._
    val got = spark.range(4096)
      .select((col("id") % 256).as("x"), (col("id") * 37 % 256).as("y"))
      .withColumn("h", graft.functions.GraftExpressions.hilbert2(col("x"), col("y")))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, h) => assert(h === refXy2d(x, y)) }
  }
}
