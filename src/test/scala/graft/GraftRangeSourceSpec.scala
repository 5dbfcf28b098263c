package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Pins the DSv2 `graft-range` connector's contract: exact row set
  * across slice boundaries (including n not divisible by slices, n <
  * slices, and n = 0), resolution by registered short name through the
  * V2 read path, and column pruning reaching the scan. */
class GraftRangeSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def read(n: Long, slices: Int) =
    spark.read.format("graft-range")
      .option("n", n.toString).option("slices", slices.toString).load()

  test("row set is exactly 0..n-1 with sq and bucket, across uneven slices") {
    val got = read(103, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    assert(got.length === 103)
    assert(got === (0L until 103L).map(i => (i, i * i, (i % 16).toInt)).toArray)
  }

  test("n < slices and n = 0 degenerate cleanly") {
    assert(read(3, 8).collect().map(_.getLong(0)).sorted === Array(0L, 1L, 2L))
    assert(read(0, 4).count() === 0L)
  }

  test("plan goes through BatchScanExec and prunes to the referenced columns") {
    val df = read(50, 4).select("bucket")
    val scans = df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq === Seq("bucket"))
    assert(df.collect().map(_.getInt(0)).sorted === (0L until 50L).map(i => (i % 16).toInt).sorted)
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): graft.sources.GraftRangeScan =
    df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
      .head.scan.asInstanceOf[graft.sources.GraftRangeScan]

  test("id range predicates narrow the generated interval (V2 filter pushdown)") {
    val df = read(1000, 4).filter("id >= 990")
    val sc = scanOf(df)
    assert((sc.lo, sc.hi) === (990L, 1000L))
    assert(df.collect().map(_.getLong(0)).sorted === (990L until 1000L).toArray)

    val eq = read(1000, 4).filter("id = 500")
    assert((scanOf(eq).lo, scanOf(eq).hi) === (500L, 501L))
    assert(eq.collect().map(r => (r.getLong(0), r.getLong(1))) === Array((500L, 250000L)))

    // an unsatisfiable range degenerates to zero partitions, zero rows
    val empty = read(1000, 4).filter("id < 0")
    assert(scanOf(empty).hi <= scanOf(empty).lo || empty.count() === 0L)
    assert(empty.count() === 0L)
  }

  test("non-id predicates stay residual: interval unchanged, results still correct") {
    val df = read(100, 4).filter("bucket = 3")
    val sc = scanOf(df)
    assert((sc.lo, sc.hi) === (0L, 100L))
    assert(df.collect().map(_.getLong(0)).sorted ===
      (0L until 100L).filter(_ % 16 == 3).toArray)
  }

  test("planner sees the requested slice parallelism") {
    val df = read(1000, 7)
    val scans = df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.head.inputRDD.getNumPartitions === 7)
  }
}
