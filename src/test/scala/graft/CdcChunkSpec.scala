package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftExpressions

/** Model-checks the native CDC boundary kernel against a Scala
  * reference, pins lossless reassembly (chunks concatenate back to the
  * document), and pins the content-defined property itself: after a
  * prefix insertion shifts every byte offset, the chunk-hash sets still
  * largely agree — the dedup win fixed-size blocking cannot deliver.
  */
class CdcChunkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def refBounds(t: String): Seq[Int] = {
    val b = t.getBytes("UTF-8")
    (7 until b.length - 1).filter { i =>
      var h = 0L; var p = 1L
      for (j <- 0 until 8) { h += (b(i - j) & 0xff).toLong * p; p *= 31L }
      h % 32L == 0L
    }.map(_ + 1)
  }

  private def chunksOf(t: String): Seq[String] = {
    val cuts = 0 +: refBounds(t) :+ t.length
    cuts.sliding(2).map { case Seq(a, b) => t.substring(a, b) }.toSeq
  }

  test("native boundaries match the reference on seeded random text") {
    GraftExpressions.ensure(spark)
    val rnd = new scala.util.Random(23)
    val texts = (1 to 50).map { _ =>
      (1 to (50 + rnd.nextInt(400))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    } ++ Seq("", "short", "x" * 7, "y" * 8, "z" * 9)
    val got = texts.toDF("text")
      .select(col("text"), GraftExpressions.cdcBoundaries(col("text")).as("b"))
      .as[(String, Seq[Int])].collect().toMap
    texts.foreach(t => assert(got(t) === refBounds(t), s"text=${t.take(20)}"))
  }

  test("chunks reassemble losslessly") {
    val rnd = new scala.util.Random(29)
    for (_ <- 1 to 20) {
      val t = (1 to 300).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      assert(chunksOf(t).mkString === t)
    }
  }

  test("prefix insertion preserves most chunk hashes (content-defined property)") {
    val rnd = new scala.util.Random(31)
    var shared = 0; var total = 0
    for (_ <- 1 to 20) {
      val t = (1 to 2000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val edited = "INSERTED-PREFIX-" + t
      val a = chunksOf(t).toSet
      val b = chunksOf(edited).toSet
      shared += a.intersect(b).size
      total += a.size
    }
    // every chunk after the first re-synchronization point is identical;
    // only the head chunk(s) differ
    assert(shared.toDouble / total > 0.8, s"shared=$shared total=$total")
  }
}
