package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew at runtime: AQE must split a pathologically skewed join partition
  * without any query rewrite (the complement of the manual salting idiom
  * in SkewSaltingSpec). One key owns ~95% of the left side; with the
  * skew-join thresholds scaled to test size, the executed plan must show
  * the sort-merge join marked `skew=true` and results must equal the
  * non-adaptive run.
  */
class AqeSkewJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("AQE splits the dedup band self-join on a viral-duplicate corpus") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // scale the skew thresholds down to test data volume
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // the q41 band-join shape on a pathological corpus: one viral
      // duplicate owns 95% of the band rows (every copy hashes to the
      // same band_val), the rest spread over 500 keys. Both join sides
      // are the same table — the partition is skewed on BOTH sides,
      // which OptimizeSkewedJoin handles by splitting left and right
      // and joining the sub-partitions pairwise.
      val bands = spark.range(60000)
        .select(col("id").as("doc_id"),
          (col("id") % 2).cast("int").as("band_id"),
          when(rand(11) < 0.95, lit(0L))
            .otherwise(pmod(col("id"), lit(500))).as("band_val"),
          concat(lit("sig"), col("id")).as("payload"))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band_id") === col("b.band_id") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
        // global aggregate: a downstream groupBy on the join key would
        // reuse the join's partitioning and AQE would decline to split
        .agg(count(lit(1)).as("n_pairs"), max(length(col("a.payload"))).as("w"))
      cand.collect()
      val plan = cand.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected the band self-join to be skew-split:\n${plan.take(1800)}")
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }

  test("AQE splits a skewed join partition (skew=true in final plan)") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // scale the skew thresholds down to test data volume
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // left: 400k rows, 95% on key 0, payload to give the partition bytes
      val left = spark.range(400000)
        .select((when(rand(7) < 0.95, 0L).otherwise(pmod(col("id"), lit(100)))).as("k"),
          concat(lit("x"), col("id")).as("payload"))
      val right = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("v"))
      // global (not per-k) aggregate: a groupBy(k) downstream would reuse
      // the join's hash partitioning, and OptimizeSkewedJoin declines to
      // split rather than introduce an extra shuffle
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), max(length(col("payload"))).as("w"))
      joined.collect() // run to let AQE produce the final plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split join in the final adaptive plan:\n${plan.take(1800)}")
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }
}
