package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.plans.GraftOps

/** The as-of join's 100 TB claim, demonstrated: a side stored bucketed by
  * the join key (and sorted by (key, time) within buckets) satisfies
  * AsOfJoinExec's ClusteredDistribution + ordering requirements from the
  * scan, so EnsureRequirements elides its Exchange (and Sort) — the
  * merge runs directly over the stored layout, exactly like a bucketed
  * sort-merge equi-join. On a telemetry store written this way, as-of
  * enrichment is shuffle-free.
  */
class AsOfJoinBucketedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  test("bucketed+sorted sides as-of join without exchanges, same result") {
    val ev = Tables.events(spark, dir).withColumn("us", unix_micros(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("us"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("r_user_id"), col("us").as("signup_us"))
      .distinct()

    spark.sql("DROP TABLE IF EXISTS b_purchases")
    spark.sql("DROP TABLE IF EXISTS b_signups")
    purchases.write.mode("overwrite")
      .bucketBy(8, "user_id").sortBy("user_id", "us")
      .saveAsTable("b_purchases")
    signups.write.mode("overwrite")
      .bucketBy(8, "r_user_id").sortBy("r_user_id", "signup_us")
      .saveAsTable("b_signups")
    try {
      val joined = GraftOps.asofJoin(
        spark.table("b_purchases"), spark.table("b_signups"),
        Seq("user_id"), Seq("r_user_id"), "us", "signup_us")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("AsOfJoin"), plan.take(2000))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed as-of join must not shuffle; plan:\n${plan.take(2000)}")

      // same rows as the shuffled plan over the raw frames
      val expect = GraftOps.asofJoin(purchases, signups,
        Seq("user_id"), Seq("r_user_id"), "us", "signup_us")
      assert(joined.count() === expect.count())
      assert(joined.exceptAll(expect).isEmpty && expect.exceptAll(joined).isEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_purchases")
      spark.sql("DROP TABLE IF EXISTS b_signups")
    }
  }
}
