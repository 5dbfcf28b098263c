package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** The banded range join (q56's construction: same-bucket + adjacent-
  * bucket equi-joins with the range predicate as a residual) must emit
  * EXACTLY the brute-force theta-join pair set — each qualifying pair
  * once, none missed, none duplicated — for any timestamp distribution,
  * including ties and bucket-boundary-straddling gaps.
  */
class RangeJoinEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  // timestamps in micros clustered tightly so bucket boundaries are hit
  // often; window = 10 units, bucket = 10 units (q56's ratio)
  private val window = 10L
  private val rowsGen: Gen[List[Long]] =
    Gen.choose(0, 120).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 300L)))

  private def bandedPairs(us: Seq[Long]): Set[(Long, Long)] = {
    import spark.implicits._
    val e = us.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "us")
      .withColumn("bkt", expr(s"us div $window"))
    def side(p: String) = e.select(col("id").as(s"${p}_id"),
      col("us").as(s"${p}_us"), col("bkt").as(s"${p}_bkt"))
    val a = side("a")
    val b = side("b")
    val range = col("b_us") >= col("a_us") &&
      col("b_us") <= col("a_us") + window &&
      (col("b_us") > col("a_us") || col("a_id") < col("b_id"))
    a.join(b, col("a_bkt") === col("b_bkt") && range)
      .unionByName(a.join(b, col("a_bkt") + 1 === col("b_bkt") && range))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
  }

  private def brutePairs(us: Seq[Long]): Set[(Long, Long)] = {
    val idx = us.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    (for {
      (ai, at) <- idx
      (bi, bt) <- idx
      if bt >= at && bt <= at + window && (bt > at || ai < bi)
    } yield (ai, bi)).toSet
  }

  test("banded pair set equals the brute-force theta join (24 random datasets)") {
    samples(rowsGen, 24).foreach { us =>
      val banded = bandedPairs(us)
      val brute = brutePairs(us)
      assert(banded == brute,
        s"missed=${(brute -- banded).take(5)} extra=${(banded -- brute).take(5)} n=${us.size}")
    }
  }

  test("duplicate emission impossible: union count equals set size") {
    samples(rowsGen, 8).foreach { us =>
      import spark.implicits._
      val asList = bandedPairs(us) // set
      val e = us.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "us").withColumn("bkt", expr(s"us div $window"))
      def side(p: String) = e.select(col("id").as(s"${p}_id"),
        col("us").as(s"${p}_us"), col("bkt").as(s"${p}_bkt"))
      val a = side("a"); val b = side("b")
      val range = col("b_us") >= col("a_us") &&
        col("b_us") <= col("a_us") + window &&
        (col("b_us") > col("a_us") || col("a_id") < col("b_id"))
      val cnt = a.join(b, col("a_bkt") === col("b_bkt") && range)
        .unionByName(a.join(b, col("a_bkt") + 1 === col("b_bkt") && range))
        .count()
      assert(cnt == asList.size, "a pair was emitted by both band joins")
    }
  }
}
