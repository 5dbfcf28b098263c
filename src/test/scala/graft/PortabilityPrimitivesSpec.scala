package graft

import java.math.BigInteger

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{TextFunctions, TopKTokens}

/** Property-style tests (seeded exhaustive sampling) for the cross-engine
  * portability primitives the oracle gate leans on: hex64 must equal the
  * mathematical value of the 15-hex-char prefix (what DuckDB's
  * CAST('0x…' AS BIGINT) computes), and the TypedImperativeAggregate's
  * binary buffer codec must round-trip arbitrary token multisets exactly.
  */
class PortabilityPrimitivesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val rnd = new scala.util.Random(42)

  private def randHex32(): String =
    Seq.fill(32)("0123456789abcdef"(rnd.nextInt(16))).mkString

  test("hex64(h) == BigInteger(h.take(15), 16) for random md5-shaped hex") {
    import spark.implicits._
    val hs = Seq.fill(200)(randHex32()) ++ Seq("0" * 32, "f" * 32)
    val got = hs.toDF("h")
      .select(TextFunctions.hex64(col("h")).as("v"))
      .as[Long].collect().toSeq
    val want = hs.map(h => new BigInteger(h.take(15), 16).longValueExact())
    assert(got == want)
  }

  test("TopKTokens serialize/deserialize round-trips arbitrary count maps") {
    val agg = TopKTokens(org.apache.spark.sql.catalyst.expressions.Literal("x"), 3)
    for (_ <- 1 to 30) {
      val buf = agg.createAggregationBuffer()
      val n = rnd.nextInt(40)
      for (_ <- 0 until n) {
        val t = rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString
        buf.merge(UTF8String.fromString(t), 1L + rnd.nextInt(1000000), (a, b) => a + b)
      }
      val back = agg.deserialize(agg.serialize(buf))
      assert(back == buf)
    }
  }

  test("TopKTokens merge is order-insensitive") {
    val agg = TopKTokens(org.apache.spark.sql.catalyst.expressions.Literal("x"), 5)
    val vocab = Seq("a", "b", "c", "dd", "ee")
    def bufOf(ts: Seq[String]) = {
      val b = agg.createAggregationBuffer()
      ts.foreach(t => b.merge(UTF8String.fromString(t), 1L, (x, y) => x + y))
      b
    }
    for (_ <- 1 to 30) {
      val l = Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
      val r = Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
      val m1 = agg.merge(bufOf(l), bufOf(r))
      val m2 = agg.merge(bufOf(r), bufOf(l))
      assert(m1 == m2)
      assert(agg.eval(m1) == agg.eval(m2))
    }
  }
}
