package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only per-query timer: runs the named registered queries (default:
  * the hot dedup pair) against SPARK_GRAFT_SF_DIR and prints seconds.
  * Not part of the shipped query surface.
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("q41_dedup_minhash", "q43_dedup_ngram")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, d).count()
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
