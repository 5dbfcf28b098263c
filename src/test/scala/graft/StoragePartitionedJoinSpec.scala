package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the DSv2 storage-partitioned-join contract on the clustered
  * graft-range scan: `clusterByBucket=true` reports
  * KeyGroupedPartitioning(identity(bucket), 16) with one HasPartitionKey
  * input partition per bucket, and with V2 bucketing enabled an
  * aggregate + equi-join on bucket between two such scans plans with
  * ZERO shuffle exchanges — while producing exactly the rows the
  * unclustered plan produces. */
class StoragePartitionedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def read(n: Long, clustered: Boolean) = {
    val r = spark.read.format("graft-range")
      .option("n", n.toString).option("slices", "4")
    (if (clustered) r.option("clusterByBucket", "true") else r).load()
  }

  private def withConfs(pairs: (String, String)*)(f: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("clustered scan: same row set as the plain scan, 16 keyed partitions") {
    val got = read(103, clustered = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    assert(got.toSeq === (0L until 103L).map(i => (i, i * i, (i % 16).toInt)))
    val scan = read(103, clustered = true).queryExecution.executedPlan
      .collect { case b: BatchScanExec => b }.head.scan
    val parts = scan.toBatch.planInputPartitions()
    assert(parts.length === 16)
    assert(parts.forall(_.isInstanceOf[
      org.apache.spark.sql.connector.read.HasPartitionKey]))
  }

  test("agg + join on bucket between two clustered scans is exchange-free") {
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      def digest(n: Long, p: String) = read(n, clustered = true)
        .groupBy("bucket")
        .agg(count(lit(1)).as(s"${p}_n"), sum("sq").as(s"${p}_sum_sq"))
      val j = digest(6400, "a").join(digest(1600, "b"), "bucket").orderBy("bucket")
      val exchanges = j.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // the final orderBy's range exchange is above the join; the JOIN
      // subtree itself must be exchange-free — assert none anywhere
      // below the join node
      val joinNode = j.queryExecution.executedPlan.collectFirst {
        case smj: org.apache.spark.sql.execution.joins.SortMergeJoinExec => smj
        case bhj: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => bhj
      }
      assert(joinNode.isDefined,
        s"no shuffled join found:\n${j.queryExecution.executedPlan}")
      val below = joinNode.get.collect { case e: ShuffleExchangeExec => e }
      assert(below.isEmpty,
        s"SPJ did not engage — exchanges under the join " +
          s"(total in plan: ${exchanges.length}):\n${j.queryExecution.executedPlan}")
      val rows = j.collect()
      assert(rows.length === 16)
      val exp = (0 until 16).map { b =>
        def stats(n: Long) = {
          val ids = (b.toLong until n by 16L)
          (ids.size.toLong, ids.map(i => i * i).sum)
        }
        (b, stats(6400), stats(1600))
      }
      rows.zip(exp).foreach { case (r, (b, (an, asum), (bn, bsum))) =>
        assert(r.getInt(0) === b)
        assert(r.getLong(1) === an); assert(r.getLong(2) === asum)
        assert(r.getLong(3) === bn); assert(r.getLong(4) === bsum)
      }
    }
  }
}
