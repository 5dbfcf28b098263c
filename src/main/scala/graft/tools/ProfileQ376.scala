package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: q376 cold-path decomposition (r13 verdict #5 follow-up).
  * Findings recorded in ADVICE.md: the per-fold cube builds in 0.84 s
  * cold (n=775 vocab rows) and the heaviest scoring join costs 0.21 s
  * cold, yet the full query's first run stays ~8-11 s — the cold tail
  * is first-execution codegen + AQE stage-by-stage materialization
  * across the plan's ~30 stages, not any recomputed frame, so cube
  * caching cannot take it under the bench's 10 s retry floor. */
object ProfileQ376 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    import org.apache.spark.sql.functions._
    import graft.core.Tables
    import graft.functions.TextFunctions.tokens
    for (i <- 1 to 3) {
      var t0 = System.nanoTime()
      val clwF = Tables.documents(spark, dir)
        .select(col("doc_id"), (col("doc_id") % 5).as("fold"), col("lang"),
          tokens(col("text")).as("ts"))
        .select(col("fold"), col("lang"), explode(col("ts")).as("w"))
        .groupBy("lang", "w", "fold").agg(count(lit(1)).as("c_f"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(f"[376] run$i cube ${(System.nanoTime() - t0) / 1e9}%6.2f n=${clwF.count()}")
      t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("q376_nb_cv_kfold")(spark, dir).count()
      println(f"[376] run$i full ${(System.nanoTime() - t0) / 1e9}%6.2f rows=$n")
      clwF.unpersist()
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
