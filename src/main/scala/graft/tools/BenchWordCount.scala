package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: time the reference's EXACT workload — word count over the six
  * Gutenberg files (4,112,297 bytes) — end to end on a warm session, for
  * the BASELINE.md single-node comparison against the reference runtime's
  * architectural latency floor (1 s poll loops, 5 s leases).
  */
object BenchWordCount {
  def main(args: Array[String]): Unit = {
    val corpus = if (args.nonEmpty) args(0) else "/root/reference/src/data"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.operators.WordCount
        .overTextFiles(spark, s"$corpus/gut-*.txt")
        .count()
      println(f"[wc] run$i ${(System.nanoTime() - t0) / 1e9}%5.2f s  distinct_words=$n")
    }
    spark.stop()
  }
}
