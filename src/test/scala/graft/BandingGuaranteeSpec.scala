package graft

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DedupPack

/** The SimHash/pHash banding guarantee (q42/q74): with a 64-bit signature
  * split into 5 bands and a Hamming threshold of 4, at most 4 bands can
  * contain a differing bit, so BY PIGEONHOLE every pair within the
  * threshold shares at least one bit-identical band — i.e. the band
  * equi-join generates ALL qualifying candidate pairs. Round 3's 2-band
  * construction violated this (a pair differing by one bit per half was
  * missed); this spec pins the repaired math, both as pure band
  * arithmetic and through the exact generated SQL the queries run.
  */
class BandingGuaranteeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val rng = new Random(42)

  private def flipBits(sig: Long, k: Int): Long = {
    var s = sig
    rng.shuffle((0 until 64).toList).take(k).foreach(b => s ^= 1L << b)
    s
  }

  test("band layout partitions all 64 bits into 5 bands") {
    assert(DedupPack.simhashBands == 5)
    assert(DedupPack.bandRanges.map(_.size).sum == 64)
    assert(DedupPack.bandRanges.flatten == (0 until 64))
    // threshold + 1 bands: the pigeonhole precondition
    assert(DedupPack.simhashBands > 4)
  }

  test("pigeonhole: every pair with Hamming <= 4 shares a band (1000 random pairs)") {
    for (_ <- 1 to 1000) {
      val a = rng.nextLong()
      val b = flipBits(a, rng.nextInt(5)) // 0..4 bit flips
      assert(java.lang.Long.bitCount(a ^ b) <= 4)
      val shared = DedupPack.bandValuesOf(a).zip(DedupPack.bandValuesOf(b))
        .count { case (x, y) => x == y }
      assert(shared >= 1,
        s"pair with Hamming ${java.lang.Long.bitCount(a ^ b)} shares no band: $a vs $b")
    }
  }

  test("adversarial: one flip per band can evade — exactly why 5 bands are needed for <=4") {
    // A pair differing by ONE bit in EACH of the 5 bands (Hamming 5, just
    // past the threshold) shares no band — the guarantee is tight.
    val a = rng.nextLong()
    val b = DedupPack.bandRanges.foldLeft(a)((s, r) => s ^ (1L << (63 - r.head)))
    assert(java.lang.Long.bitCount(a ^ b) == 5)
    val shared = DedupPack.bandValuesOf(a).zip(DedupPack.bandValuesOf(b))
      .count { case (x, y) => x == y }
    assert(shared == 0)
  }

  test("generated SQL pack/band expressions match the Scala mirror") {
    // Feed vote columns derived from known signatures through the exact
    // expression strings q42/q74 execute; the packed signature must
    // reconstruct the original and the band values must equal the mirror.
    val sigs = Seq.fill(64)(rng.nextLong()) :+ 0L :+ -1L :+ Long.MinValue :+ Long.MaxValue
    val schema = StructType(StructField("sig", LongType) +:
      (0 until 64).map(b => StructField(s"s$b", IntegerType)))
    val rows = sigs.map { sig =>
      // vote >= 0 <=> bit set (MSB-first: s_b is bit 63-b)
      Row.fromSeq(sig +: (0 until 64).map(b =>
        if (((sig >>> (63 - b)) & 1L) == 1L) 1 else -1))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val out = df.selectExpr(
      Seq("sig", s"${DedupPack.simhashExpr} AS packed") ++ DedupPack.bandValExprs: _*)
      .collect()
    out.foreach { r =>
      val sig = r.getLong(0)
      assert(r.getLong(1) == sig, s"packed signature mismatch for $sig")
      val mirror = DedupPack.bandValuesOf(sig)
      (0 until DedupPack.simhashBands).foreach { k =>
        assert(r.getLong(2 + k) == mirror(k), s"band $k mismatch for $sig")
      }
    }
  }
}
