package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PrefixSum

/** Model-checks the two-phase distributed scan against the sequential
  * definition (scanLeft) on seeded random inputs, including inputs much
  * smaller than the partition count (empty partitions must contribute
  * zero offsets) and duplicate values under a unique tiebreak key.
  */
class PrefixSumSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("matches the sequential scan on seeded random inputs") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(1, 5, 100, 3000)) {
      val rows = (0 until n).map(i => (i.toLong, rnd.nextInt(50).toLong))
      val df = rows.toDF("k", "v")
      val got = PrefixSum.inclusive(df, Seq(col("v").desc, col("k")),
          Seq((col("v"), "cum"), (lit(1L), "rank")))
        .select("k", "cum", "rank")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      val ordered = rows.sortBy { case (k, v) => (-v, k) }
      val expCum = ordered.scanLeft(0L)(_ + _._2).tail
      val exp = ordered.zip(expCum).zipWithIndex
        .map { case (((k, _), c), i) => (k, c, i + 1L) }
        .sortBy(_._1)
      assert(got.toSeq === exp, s"n=$n")
    }
  }

  test("exclusive max-scan matches the sequential definition") {
    val rnd = new scala.util.Random(13)
    for (n <- Seq(1, 5, 100, 3000)) {
      val rows = (0 until n).map(i => (i.toLong, rnd.nextInt(40).toLong))
      val df = rows.toDF("k", "v")
      val got = PrefixSum.exclusiveMax(df, Seq(col("k")), col("v"),
          "prevmax", -1L)
        .select("k", "prevmax")
        .as[(Long, Long)].collect().sortBy(_._1)
      // sequential exclusive running max in k order
      val ordered = rows.sortBy(_._1)
      val exp = ordered.zip(ordered.scanLeft(-1L)((m, r) => math.max(m, r._2)))
        .map { case ((k, _), m) => (k, m) }
      assert(got.toSeq === exp, s"n=$n")
      // a non-trivial order (v desc, k tiebreak): prevmax in that order
      // is the max v among strictly earlier rows
      val got2 = PrefixSum.exclusiveMax(df, Seq(col("v").desc, col("k")),
          col("k"), "prevk", Long.MinValue)
        .select("k", "prevk")
        .as[(Long, Long)].collect().sortBy(_._1)
      val ordered2 = rows.sortBy { case (k, v) => (-v, k) }
      val exp2 = ordered2.zip(ordered2.scanLeft(Long.MinValue)((m, r) => math.max(m, r._1)))
        .map { case ((k, _), m) => (k, m) }.sortBy(_._1)
      assert(got2.toSeq === exp2, s"n=$n order2")
    }
  }

  test("per-key scan matches the per-key sequential definition") {
    val rnd = new scala.util.Random(11)
    for (n <- Seq(1, 7, 100, 3000)) {
      val rows = (0 until n).map(i =>
        (s"src${rnd.nextInt(4)}", i.toLong, rnd.nextInt(50).toLong))
      val df = rows.toDF("src", "k", "v")
      // ascending order key
      val got = PrefixSum.inclusivePerKey(df, Seq("src"), Seq(col("k")),
          Seq((col("v"), "cum")))
        .select("src", "k", "cum")
        .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2))
      val exp = rows.groupBy(_._1).toSeq.flatMap { case (src, rs) =>
        val ordered = rs.sortBy(_._2)
        ordered.zip(ordered.scanLeft(0L)(_ + _._3).tail)
          .map { case ((_, k, _), c) => (src, k, c) }
      }.sortBy(r => (r._1, r._2))
      assert(got.toSeq === exp, s"n=$n asc")
      // descending order key with unique tiebreak (the q150 shape)
      val gotD = PrefixSum.inclusivePerKey(df, Seq("src"),
          Seq(col("v").desc, col("k")), Seq((col("v"), "cum")))
        .select("src", "k", "cum")
        .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2))
      val expD = rows.groupBy(_._1).toSeq.flatMap { case (src, rs) =>
        val ordered = rs.sortBy { case (_, k, v) => (-v, k) }
        ordered.zip(ordered.scanLeft(0L)(_ + _._3).tail)
          .map { case ((_, k, _), c) => (src, k, c) }
      }.sortBy(r => (r._1, r._2))
      assert(gotD.toSeq === expD, s"n=$n desc")
    }
  }
}
