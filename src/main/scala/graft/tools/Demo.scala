package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: drive library APIs that aren't part of the query registry.
  *
  *   sbt "runMain graft.tools.Demo sessionize /root/testdata/sf0.001"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val what = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    what match {
      case "sessionize" =>
        val ds = graft.streaming.SessionizeStream.run(spark, dir)
        println(s"closed sessions: ${ds.count()}")
        ds.orderBy("user_id", "start_us").show(10, truncate = false)
      case other =>
        System.err.println(s"unknown demo: $other")
    }
    spark.stop()
  }
}
