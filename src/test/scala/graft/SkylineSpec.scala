package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins q205's dominance semantics on crafted tie cases, against an
  * in-JVM brute-force quadratic dominance check (the oracle runs the
  * same quadratic formulation in DuckDB; this spec makes the edge cases
  * explicit and runnable without the oracle).
  */
class SkylineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (partkey, brand, size, price)
  private val parts = Seq(
    (1L, "B1", 10, 5.00),  // frontier
    (2L, "B1", 10, 5.00),  // exact duplicate of 1: BOTH kept (no strict edge)
    (3L, "B1", 10, 6.00),  // dominated by 1 (same size, dearer)
    (4L, "B1", 20, 7.00),  // frontier (bigger, dearer)
    (5L, "B1", 5, 4.00),   // frontier (smaller, cheaper)
    (6L, "B1", 20, 8.00),  // dominated by 4
    (7L, "B2", 1, 9.99),   // lone part in its brand: frontier
    (8L, "B1", 15, 7.00)   // dominated by 4 (same price, smaller)
  )

  private lazy val dir: String = {
    val tmp = Files.createTempDirectory("graft-sky").toString
    parts.map { case (k, b, sz, pr) => (k, s"part$k", b, "T", sz, pr) }
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/part.parquet")
    tmp
  }

  private def brute: Set[Long] = {
    def dominates(a: (Long, String, Int, Double), b: (Long, String, Int, Double)): Boolean =
      a._2 == b._2 && a._4 <= b._4 && a._3 >= b._3 && (a._4 < b._4 || a._3 > b._3)
    parts.filter(p => !parts.exists(k => dominates(k, p))).map(_._1).toSet
  }

  test("windowed skyline equals quadratic dominance incl. exact-duplicate ties") {
    val got = SparkEntry.queries("q205_skyline")(spark, dir)
      .select("p_partkey").as[Long].collect().toSet
    assert(got === brute)
    assert(got === Set(1L, 2L, 4L, 5L, 7L)) // the hand-derived frontier
  }
}
