package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.CountMinSketchAgg

/** Model check of the Count-Min aggregate, driving
  * update/serialize/deserialize/merge/eval directly (no Spark job): for
  * ANY stream, ANY partition split, and ANY merge order, the produced
  * matrix must equal the mathematical definition
  * `M[r][c] = Σ count(x) over x with h_r(x) = c` computed independently
  * here — the sketch is LINEAR, so the merge tree must be invisible.
  * Then the CMS guarantees on the probe: overestimate-only, and
  * exactness when no row collides (the q104 gate regime).
  */
class CountMinSpec extends AnyFunSuite {

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def forAll[T](gen: Gen[T], n: Int = 24)(body: T => Unit): Unit =
    samples(gen, n).foreach(body)

  // deliberately TINY width: collisions are the norm, not the exception
  private val depth = 3
  private val width = 16
  private val agg =
    CountMinSketchAgg(BoundReference(0, StringType, nullable = true), depth, width)

  /** The reference hash — recomputed independently from the aggregate's
    * code path (md5 hex → first 15 chars → int64), the same derivation
    * the DuckDB oracle uses. */
  private def refSlot(r: Int, key: String, w: Int): Int = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"$r:$key".getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 15), 16) % w).toInt
  }

  private def matrixOf(a: Any, d: Int, w: Int): Array[Array[Long]] =
    a.asInstanceOf[ArrayData].toObjectArray(null).map(row =>
      row.asInstanceOf[ArrayData].toLongArray())

  private def refMatrix(xs: Seq[String], d: Int, w: Int): Array[Array[Long]] = {
    val m = Array.fill(d)(new Array[Long](w))
    val counts = xs.groupBy(identity).view.mapValues(_.size.toLong)
    for ((k, c) <- counts; r <- 0 until d) m(r)(refSlot(r, k, w)) += c
    m
  }

  private val streamGen: Gen[List[String]] = for {
    n <- Gen.choose(0, 400)
    xs <- Gen.listOfN(n, Gen.frequency(
      (40, Gen.const("hot")),
      (20, Gen.const("warm")),
      (10, Gen.oneOf("c", "d", "e")),
      (30, Gen.choose(0, 60).map(i => f"t$i%02d"))))
  } yield xs

  test("matrix equals its definition for any stream, split, merge order") {
    val caseGen = for {
      xs <- streamGen
      parts <- Gen.choose(1, 7)
      seed <- Gen.long
    } yield (xs, parts, seed)
    forAll(caseGen) { case (xs, parts, seed) =>
      val rnd = new scala.util.Random(seed)
      val chunks = xs.grouped(math.max(1, (xs.size + parts - 1) / parts)).toList
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
      val got = matrixOf(agg.eval(bufs.head), depth, width)
      val want = refMatrix(xs, depth, width)
      assert(got.map(_.toSeq).toSeq === want.map(_.toSeq).toSeq,
        s"matrix diverged from definition (n=${xs.size}, parts=$parts)")
    }
  }

  test("probe is overestimate-only, exact when no row collides") {
    forAll(streamGen) { xs =>
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // colliding regime: est >= true always
      val m = refMatrix(xs, depth, width)
      for ((k, t) <- truth) {
        val est = (0 until depth).map(r => m(r)(refSlot(r, k, width))).min
        assert(est >= t, s"underestimate for $k: est=$est true=$t")
      }
      // wide regime: width >> alphabet (< 70 distinct) makes per-row
      // collisions rare; when a key collides in NO row, est == true
      val wWide = 4096
      val mWide = refMatrix(xs, depth, wWide)
      val slotsTaken = Array.fill(depth)(collection.mutable.Map.empty[Int, Int])
      for (k <- truth.keys; r <- 0 until depth)
        slotsTaken(r).updateWith(refSlot(r, k, wWide))(c => Some(c.getOrElse(0) + 1))
      for ((k, t) <- truth) {
        val collides = (0 until depth).forall(r => slotsTaken(r)(refSlot(r, k, wWide)) > 1)
        val est = (0 until depth).map(r => mWide(r)(refSlot(r, k, wWide))).min
        if (!collides) assert(est == t, s"collision-free key $k: est=$est true=$t")
      }
    }
  }
}
