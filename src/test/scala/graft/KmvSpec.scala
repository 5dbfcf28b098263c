package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RelationalPack3

/** Statistical and exact-regime properties of q228's KMV join-size
  * estimator that the hash-gate (which pins determinism, not accuracy)
  * can't express:
  *   - exact regime: sides with < k = 256 distinct keys estimate
  *     exactly (the sketch IS the value set);
  *   - sketch regime: relative error stays within 5σ ≈ 31% of truth
  *     (σ ≈ 1/√(k−2) for KMV) on seeded random key sets — loose enough
  *     to never flake, tight enough to catch an estimator bug (an
  *     off-by-2^k scale error, a wrong tail pick) instantly;
  *   - intersection: a ⊇ b makes the common estimate track |b|.
  */
class KmvSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def keysDf(keys: Seq[Long]) = {
    import spark.implicits._
    keys.toDF("key")
  }

  private def row(a: Seq[Long], b: Seq[Long]) =
    RelationalPack3.kmvEdge("t", keysDf(a), keysDf(b)).collect()(0)

  test("exact regime: < 256 distinct keys per side estimates exactly") {
    val r = row((1L to 100L), (50L to 149L))
    assert(r.getAs[Long]("est_a") == 100L && r.getAs[Long]("est_b") == 100L)
    assert(r.getAs[Long]("est_common") == 51L &&
      r.getAs[Long]("exact_common") == 51L)
  }

  test("sketch regime: estimates within 5 sigma of truth on random keys") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(2000, 5000)) {
      val a = Seq.fill(n * 2)(rnd.nextLong()).distinct.take(n)
      val overlap = a.take(n / 2)
      val b = (overlap ++ Seq.fill(n)(rnd.nextLong()).distinct.take(n / 2)).distinct
      val r = row(a, b)
      val tol = 5.0 / math.sqrt(254.0)
      def ok(est: Long, exact: Long) =
        math.abs(est - exact).toDouble / exact <= tol
      assert(ok(r.getAs[Long]("est_a"), r.getAs[Long]("exact_a")),
        s"n=$n est_a=${r.getAs[Long]("est_a")} exact=${r.getAs[Long]("exact_a")}")
      assert(ok(r.getAs[Long]("est_b"), r.getAs[Long]("exact_b")),
        s"n=$n est_b=${r.getAs[Long]("est_b")} exact=${r.getAs[Long]("exact_b")}")
      assert(ok(r.getAs[Long]("est_common"), r.getAs[Long]("exact_common")),
        s"n=$n est_common=${r.getAs[Long]("est_common")} " +
          s"exact=${r.getAs[Long]("exact_common")}")
    }
  }
}
