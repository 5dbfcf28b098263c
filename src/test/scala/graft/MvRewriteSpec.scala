package graft

import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the MV rewrite rule's firing conditions and its all-or-nothing
  * fallback: a matching aggregate is answered from the rollup, any
  * unmatched aggregate keeps the base-table plan, and both plans produce
  * identical results.
  */
class MvRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = SparkTestSession.sfDir

  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case f: HadoopFsRelation => f.location.rootPaths.mkString(",")
        case r => r.toString
      }
    }

  private def withMv[T](f: => T): T = {
    val mvPath = graft.plans.MvRewrite.lineitemRollup(spark, d)
    graft.plans.MvRewrite.ensure(spark)
    spark.conf.set("spark.graft.mv.lineitem.path", mvPath)
    try f finally spark.conf.unset("spark.graft.mv.lineitem.path")
  }

  private def matching = graft.core.Tables.lineitem(spark, d)
    .groupBy("l_returnflag", "l_linestatus")
    .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
      count(lit(1)).as("n_rows"))

  test("matching aggregate is rewritten to the MV and equals the direct plan") {
    val direct = matching.orderBy("l_returnflag", "l_linestatus").collect().toSeq
    withMv {
      val df = matching
      assert(scanPaths(df).exists(_.contains("mv_lineitem_rfls")))
      assert(!scanPaths(df).exists(_.contains("lineitem.parquet")))
      val rewritten = df.orderBy("l_returnflag", "l_linestatus").collect().toSeq
      assert(rewritten === direct)
    }
  }

  test("a cast folded onto the aggregate result still rewrites") {
    // CollapseProject merges `cast(sum_qty as double)` into the aggregate's
    // result expressions — the matcher must see through the cast, or the
    // executed plan silently falls back to the fact table
    withMv {
      val df = matching.select(col("l_returnflag"), col("l_linestatus"),
        col("sum_qty").cast("double").as("sum_qty"), col("n_rows"))
      assert(scanPaths(df).exists(_.contains("mv_lineitem_rfls")))
      assert(!scanPaths(df).exists(_.contains("lineitem.parquet")))
    }
  }

  test("an unmatched aggregate aborts the rewrite (all-or-nothing fallback)") {
    withMv {
      val df = graft.core.Tables.lineitem(spark, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("sum_price"))
      assert(scanPaths(df).exists(_.contains("lineitem.parquet")))
      assert(!scanPaths(df).exists(_.contains("mv_lineitem_rfls")))
      assert(df.count() === 6)
    }
  }

  test("a filtered scan aborts the rewrite") {
    withMv {
      val df = graft.core.Tables.lineitem(spark, d)
        .filter(col("l_quantity") > 10)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"))
      assert(scanPaths(df).exists(_.contains("lineitem.parquet")))
    }
  }

  test("rule is inert without the registration conf") {
    graft.plans.MvRewrite.ensure(spark)
    val df = matching
    assert(scanPaths(df).exists(_.contains("lineitem.parquet")))
  }
}
