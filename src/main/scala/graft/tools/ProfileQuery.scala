package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: time one registered query end-to-end (count(), Bench-style
  * session confs) for N runs, cold cache each run.
  *
  *   sbt "runMain graft.tools.ProfileQuery q12_join_hash_topk /root/testdata/sf0.1 3"
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    // mirror Bench's session exactly so profiled plans are the plans the
    // benchmark executes
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"[pq] $name run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
      spark.sharedState.cacheManager.clearCache()
      // match Bench's untimed inter-query GC (ContextCleaner backlog —
      // see Bench.timeOne)
      System.gc(); Thread.sleep(300)
    }
    spark.stop()
  }
}
