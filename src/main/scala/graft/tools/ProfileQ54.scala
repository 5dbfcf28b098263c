package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: time q54's 8 method arms individually (each arm's top-k
  * counted alone, Bench-style session), so the panel's cost tail is
  * attributable — the r13 verdict asks the 7.5 s panel to share its
  * artifacts down to ≤4.5 s steady.
  *
  *   sbt "runMain graft.tools.ProfileQ54 [sfDir] [runs]"
  */
object ProfileQ54 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = if (args.length > 1) args(1).toInt else 2
    val aqe = if (args.length > 2) args(2) else "true"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    import graft.operators.SimilarityPack
    for (i <- 1 to runs) {
      val tAll0 = System.nanoTime()
      val vecs = SimilarityPack.persistedVecs(spark, dir)
      val tTruth0 = System.nanoTime()
      val truthN = SimilarityPack.bruteTopKHook(vecs).count()
      println(f"[q54] run$i truth  ${(System.nanoTime() - tTruth0) / 1e9}%6.2f s rows=$truthN")
      val tCon0 = System.nanoTime()
      val (methods, ranked) = SimilarityPack.q54Methods(spark, dir, vecs)
      println(f"[q54] run$i CONSTRUCT(all arms) ${(System.nanoTime() - tCon0) / 1e9}%6.2f s")
      methods.foreach { case (m, out) =>
        val t0 = System.nanoTime()
        val n = out.filter(col("q_id") < 5).count()
        println(f"[q54] run$i $m%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
      }
      ranked.unpersist(); vecs.unpersist()
      println(f"[q54] run$i TOTAL  ${(System.nanoTime() - tAll0) / 1e9}%6.2f s")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
