package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SortExec
import org.scalatest.funsuite.AnyFunSuite

/** Pins the graft-range `SupportsReportOrdering` contract BOTH ways:
  * consumers ordered by `id` plan no Sort (the report elides it), and
  * consumers ordered by a column the scan does NOT report (`sq`) still
  * plan one — proving the q477 gate's zero-SortExec REQUIRE is a real
  * elision, not a vacuously-empty plan traversal. */
class ReportOrderingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def scan(slices: Int): DataFrame =
    spark.read.format("graft-range")
      .option("n", "10000").option("slices", slices.toString).load()

  private def sortsIn(df: DataFrame): Int = {
    df.collect() // finalize any adaptive plan before traversing it
    var c = 0
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case s: SortExec => c += 1
        case _ =>
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    c
  }

  test("sortWithinPartitions(id) is elided by the ordering report") {
    assert(sortsIn(scan(8).sortWithinPartitions("id")) === 0)
  }

  test("sortWithinPartitions(sq) — unreported column — still sorts") {
    assert(sortsIn(scan(8).sortWithinPartitions("sq")) >= 1)
  }

  test("an ordered window still sorts: the SinglePartition exchange erases order") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.orderBy("id")
    assert(sortsIn(scan(1).withColumn("d", lag("id", 1).over(w))) >= 1)
  }

  test("a global orderBy keeps its range-shuffle sort — honestly NOT elided") {
    assert(sortsIn(scan(1).orderBy("id")) >= 1)
  }

  test("ordering values really arrive ascending per partition") {
    val rows = scan(4).sortWithinPartitions("id")
      .select("id").collect().map(_.getLong(0))
    // per-partition ascending: within each contiguous slice the ids rise
    val slices = scan(4).select("id").rdd
      .mapPartitions(it => Iterator.single(it.map(_.getLong(0)).toSeq)).collect()
    slices.foreach(sl => assert(sl === sl.sorted))
    assert(rows.length === 10000)
  }
}
