package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftExpressions
import graft.functions.GraftExpressions.{bloom, bloomMightContain}

/** Pins the graft_bloom aggregate + graft_bloom_might_contain probe:
  * the zero-false-negative guarantee (the property that makes the
  * q121 pre-filter answer-preserving), bitwise partition-independence
  * of the OR-merge, and a measured false-positive rate within the
  * analytic bound.
  */
class BloomFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Bits = 1 << 14
  private val K = 7

  // 1000 keys spread over the int64 space (not 0..n: exercise the mix)
  private def keys = spark.range(1000).select((col("id") * 2654435761L + 17L).as("key"))

  test("no false negatives: every inserted key probes true") {
    GraftExpressions.ensure(spark)
    val bf = keys.repartition(8).agg(bloom(col("key"), Bits, K).as("bf"))
    val misses = keys.crossJoin(broadcast(bf))
      .where(!bloomMightContain(col("bf"), col("key"), K))
      .count()
    assert(misses === 0L)
  }

  test("merge is bitwise partition-independent") {
    GraftExpressions.ensure(spark)
    val one = keys.coalesce(1).agg(bloom(col("key"), Bits, K).as("bf"))
      .as[Seq[Long]].head()
    val many = keys.repartition(16).agg(bloom(col("key"), Bits, K).as("bf"))
      .as[Seq[Long]].head()
    assert(one === many)
  }

  test("false-positive rate stays under the analytic envelope") {
    GraftExpressions.ensure(spark)
    val bf = keys.agg(bloom(col("key"), Bits, K).as("bf"))
    // disjoint probe set (odd offsets of a different stride)
    val probes = spark.range(10000).select((col("id") * 40503L + 1000003L).as("key"))
    val fp = probes.crossJoin(broadcast(bf))
      .where(bloomMightContain(col("bf"), col("key"), K))
      .count()
    // theory: (1 - e^(-k*n/m))^k ~ 6e-4 at n=1000, m=2^14, k=7;
    // 10x headroom on 10k probes
    assert(fp < 60L, s"false positives $fp / 10000")
  }
}
