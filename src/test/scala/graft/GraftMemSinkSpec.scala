package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Pins the DSv2 `graft-mem` sink's write contract: partition-parallel
  * writers surface rows only at commit, append accumulates across
  * writes, read-back goes through a V2 BatchScan, and an unknown table
  * fails loudly rather than returning empty. */
class GraftMemSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def fresh(): String = s"spec_${System.nanoTime()}"

  test("write -> read roundtrip preserves the exact row multiset across partitions") {
    import spark.implicits._
    val tbl = fresh()
    val df = (1L to 100L).map(i => (i, s"v$i", i * 2.0)).toDF("id", "s", "x")
      .repartition(7)
    df.write.format("graft-mem").option("table", tbl).mode("append").save()
    val back = spark.read.format("graft-mem").option("table", tbl).load()
    val scans = back.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty)
    assert(back.schema.fieldNames.toSeq === Seq("id", "s", "x"))
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1).toSeq === (1L to 100L).map(i => (i, s"v$i", i * 2.0)))
  }

  test("append mode accumulates; a second write doubles the rows") {
    import spark.implicits._
    val tbl = fresh()
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    df.write.format("graft-mem").option("table", tbl).mode("append").save()
    df.write.format("graft-mem").option("table", tbl).mode("append").save()
    assert(spark.read.format("graft-mem").option("table", tbl).load().count() === 4L)
  }

  test("reading an unknown table fails loudly") {
    val e = intercept[Exception] {
      spark.read.format("graft-mem").option("table", "never_written").load()
    }
    assert(e.getMessage.contains("unknown table"))
  }
}
