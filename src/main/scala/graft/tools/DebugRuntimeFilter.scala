package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: inspect whether dynamic pruning reaches the graft-range
  * scan under different conf combinations. */
object DebugRuntimeFilter {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (aqe <- Seq("false", "true"); reuseOnly <- Seq("true", "false")) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", reuseOnly)
      val dim = spark.range(0, 128).filter(col("id") < 64)
        .select((col("id") * 13441L + 77L).as("did"))
      val fact = spark.read.format("graft-range")
        .option("n", "1000000").option("slices", "8").load()
      val agg = fact.join(dim, col("id") === col("did"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
      agg.collect()
      def scans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            scans(a.executedPlan)
          case other => other.collect {
            case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => Seq(b)
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              scans(a.executedPlan)
          }.flatten
        }
      val ss = scans(agg.queryExecution.executedPlan)
      val rt = ss.headOption.map(_.scan.asInstanceOf[graft.sources.GraftRangeScan].runtimeSet.map(_.length))
      println(s"aqe=$aqe reuseOnly=$reuseOnly scans=${ss.size} runtimeSet=$rt " +
        s"runtimeFilters=${ss.headOption.map(_.runtimeFilters.size)}")
      if (args.contains("-v"))
        println(agg.queryExecution.executedPlan.toString.take(3000))
    }
    spark.stop()
  }
}
