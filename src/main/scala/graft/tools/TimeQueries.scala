package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiling harness: time a comma-separated list of registered
  * queries at a given sf dir, Bench-identically configured (AQE on,
  * 32 shuffle partitions, warm artifacts unless --cold), printing
  * per-query seconds for two passes (cold-ish + steady). Not part of
  * the driver contract — used to iterate on the cost tail without
  * paying a full-registry bench. */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val qs = graft.SparkEntry.queries
    names.foreach { name =>
      val fn = qs(name)
      val passes = sys.env.getOrElse("SPARK_GRAFT_TIME_PASSES", "2").toInt
      (1 to passes).foreach { pass =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        // deferred ContextCleaner work (checkpoint blocks, shuffle
        // state) only runs after the driver GCs the weak refs; without
        // this untimed GC the backlog degrades later passes (q54
        // measured 10 → 84 s over 5 passes). Matches Bench.timeOne.
        // SPARK_GRAFT_TIME_GC=0 disables, for reproducing the backlog.
        if (!sys.env.get("SPARK_GRAFT_TIME_GC").contains("0")) {
          System.gc()
          Thread.sleep(sys.env.getOrElse("SPARK_GRAFT_TIME_GC_MS", "1000").toLong)
        }
        println(f"[time] $name pass$pass ${sec}%.2f s")
      }
    }
    spark.stop()
  }
}
