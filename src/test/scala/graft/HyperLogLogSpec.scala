package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.HyperLogLogAgg

/** Model check of the HyperLogLog aggregate (q149), driving
  * update/serialize/deserialize/merge/eval directly: for ANY stream, ANY
  * partition split, ANY merge order AND ANY chunk replay, the register
  * file must equal the mathematical definition
  * `R[j] = max rho(x) over distinct x with idx(x) = j` computed
  * independently here via the SQL-oracle derivation (md5 hex → 60-bit
  * int → low-p index, bin-string bit length for rho) — register max is
  * idempotent, so unlike the linear CMS the HLL must also absorb
  * DUPLICATED delivery, which this spec injects deliberately.
  */
class HyperLogLogSpec extends AnyFunSuite {

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def forAll[T](gen: Gen[T], n: Int = 24)(body: T => Unit): Unit =
    samples(gen, n).foreach(body)

  private val p = 8
  private val m = 1 << p
  private val agg = HyperLogLogAgg(BoundReference(0, StringType, nullable = true), p)

  /** The reference register derivation — independent of the aggregate's
    * code path and written the way the DuckDB oracle writes it: 60-bit
    * value from the first 15 md5 hex chars, index = h % m, and
    * rho = (60 - p) + 1 - bitlength(h >> p) with bitlength from the
    * binary-string length (the `length(bin(rest))` form). */
  private def refIdxRho(key: String): (Int, Long) = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(key.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val rest = h >>> p
    val bitlen = if (rest == 0) 0 else java.lang.Long.toBinaryString(rest).length
    ((h % m).toInt, (60 - p) + 1L - bitlen)
  }

  private def refRegisters(xs: Seq[String]): Array[Long] = {
    val r = new Array[Long](m)
    for (k <- xs.distinct) {
      val (idx, rho) = refIdxRho(k)
      if (rho > r(idx)) r(idx) = rho
    }
    r
  }

  private val streamGen: Gen[List[String]] = for {
    n <- Gen.choose(0, 500)
    xs <- Gen.listOfN(n, Gen.frequency(
      (30, Gen.const("hot")),
      (40, Gen.choose(0, 5000).map(i => s"k$i")),
      (30, Gen.choose(0, 60).map(i => f"t$i%02d"))))
  } yield xs

  test("registers equal definition for any stream, split, merge order, replay") {
    val caseGen = for {
      xs <- streamGen
      parts <- Gen.choose(1, 7)
      seed <- Gen.long
      replay <- Gen.oneOf(true, false)
    } yield (xs, parts, seed, replay)
    forAll(caseGen) { case (xs, parts, seed, replay) =>
      val rnd = new scala.util.Random(seed)
      val chunks0 = xs.grouped(math.max(1, (xs.size + parts - 1) / parts)).toList
      // idempotence under duplicated delivery: re-merge some chunks twice
      val chunks = if (replay && chunks0.nonEmpty)
        chunks0 ++ rnd.shuffle(chunks0).take(1 + rnd.nextInt(chunks0.size))
      else chunks0
      var bufs = chunks.map { chunk =>
        val b = agg.createAggregationBuffer()
        chunk.foreach(v => agg.update(b, InternalRow(UTF8String.fromString(v))))
        agg.deserialize(agg.serialize(b)) // exercise the wire format
      }
      if (bufs.isEmpty) bufs = List(agg.createAggregationBuffer())
      while (bufs.size > 1) {
        val shuffled = rnd.shuffle(bufs)
        bufs = agg.merge(shuffled.head, shuffled(1)) :: shuffled.drop(2)
      }
      val got = agg.eval(bufs.head).asInstanceOf[ArrayData].toLongArray()
      val want = refRegisters(xs)
      assert(got.toSeq === want.toSeq,
        s"registers diverged (n=${xs.size}, parts=$parts, replay=$replay)")
    }
  }

  test("null inputs are ignored; empty stream is the all-zeros file") {
    val b = agg.createAggregationBuffer()
    agg.update(b, InternalRow(null))
    assert(agg.eval(b).asInstanceOf[ArrayData].toLongArray().forall(_ == 0L))
  }

  test("q149 fixed-point estimate lands within 3 standard errors of truth") {
    // the q149 gate's exact int64 chain, replayed here over a stream big
    // enough for the raw-HLL regime (n >> 2.5m): est = alpha·m²·2^53/Z
    val n = 20000
    val regs = refRegisters((0 until n).map(i => s"key-$i"))
    val z = regs.map(r => 1L << (53 - r.toInt)).sum
    val rawEstMicro = 718272L * ((1L << 53) / math.max(z >> 16, 1L))
    val est = rawEstMicro / 1000000.0
    val se = 1.04 / math.sqrt(m.toDouble) * n
    assert(math.abs(est - n) <= 3 * se,
      s"estimate $est too far from $n (3se=${3 * se})")
  }
}
