package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.SpaceSavingTopK

/** Property-based check of the SpaceSaving guarantees, driving the
  * aggregate directly (update/serialize/deserialize/merge/eval on raw
  * buffers — no Spark job): for ANY stream over a small alphabet, ANY
  * partition split, and ANY merge order,
  *
  *   - est(x) >= true(x) for every reported counter (overestimate-only)
  *   - est(x) <= true(x) + N_other/capacity-style bound: per partial
  *     buffer the error is bounded by its own N/capacity; summed floors
  *     across merges keep the global bound N/capacity
  *   - any x with true(x) > N/capacity appears in the summary
  *   - the buffer never exceeds `capacity` counters.
  */
class SpaceSavingPropertySpec extends AnyFunSuite {

  // deterministic sampler, same pattern as MapReduceJobSpec
  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def forAll[T](gen: Gen[T], n: Int = 24)(body: T => Unit): Unit =
    samples(gen, n).foreach(body)

  private val agg = SpaceSavingTopK(BoundReference(0, StringType, nullable = true), 16, 16)

  private def parse(a: Any): Map[String, Long] =
    a.asInstanceOf[ArrayData].toObjectArray(StringType).map { s =>
      val str = s.asInstanceOf[UTF8String].toString
      val i = str.lastIndexOf(':')
      str.substring(0, i) -> str.substring(i + 1).toLong
    }.toMap

  private val streamGen: Gen[List[String]] = for {
    n <- Gen.choose(0, 400)
    // zipf-ish: small alphabet with skewed weights
    xs <- Gen.listOfN(n, Gen.frequency(
      (40, Gen.const("hot")),
      (20, Gen.const("warm")),
      (10, Gen.oneOf("c", "d", "e")),
      (30, Gen.choose(0, 60).map(i => f"t$i%02d"))))
  } yield xs

  test("invariants hold for any stream, any split, any merge order") {
    val caseGen = for {
      xs <- streamGen
      parts <- Gen.choose(1, 7)
      seed <- Gen.long
    } yield (xs, parts, seed)
    forAll(caseGen) { case (xs, parts, seed) =>
      val rnd = new scala.util.Random(seed)
      val capacity = 16
      // split the stream into `parts` partial buffers
      val chunks = xs.grouped(math.max(1, (xs.size + parts - 1) / parts)).toList
      var bufs = chunks.map { chunk =>
        val b = agg.createAggregationBuffer()
        chunk.foreach(v => agg.update(b, InternalRow(UTF8String.fromString(v))))
        // exercise the wire format on every partial
        agg.deserialize(agg.serialize(b))
      }
      if (bufs.isEmpty) bufs = List(agg.createAggregationBuffer())
      // merge in random order
      while (bufs.size > 1) {
        val shuffled = rnd.shuffle(bufs)
        bufs = agg.merge(shuffled.head, shuffled(1)) :: shuffled.drop(2)
      }
      val est = parse(agg.eval(bufs.head))
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = xs.size.toDouble
      val bound = n / capacity
      assert(est.size <= capacity)
      for ((k, e) <- est) {
        val t = truth.getOrElse(k, 0L)
        assert(e >= t, s"underestimate for $k: est=$e true=$t (stream size ${xs.size})")
        assert(e <= t + bound, s"error bound broken for $k: est=$e true=$t bound=$bound")
      }
      for ((k, t) <- truth if t > bound) {
        assert(est.contains(k), s"heavy hitter $k (true=$t > $bound) missing from $est")
      }
    }
  }

  test("single full buffer with capacity >= alphabet is exact") {
    forAll(streamGen) { xs =>
      val wide = SpaceSavingTopK(BoundReference(0, StringType, nullable = true), 128, 128)
      val b = wide.createAggregationBuffer()
      xs.foreach(v => wide.update(b, InternalRow(UTF8String.fromString(v))))
      val est = parse(wide.eval(b))
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // alphabet (< 70 distinct) fits in capacity 128: no eviction ever
      // fires, so the sketch IS the exact multiset count
      assert(est == truth, s"exact regime must equal true counts: $est vs $truth")
    }
  }
}
