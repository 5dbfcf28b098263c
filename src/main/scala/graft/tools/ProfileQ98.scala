package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: q98 stream-stream join cost vs shuffle/state partition count. */
object ProfileQ98 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    for (parts <- Seq(32, 8, 32, 8)) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val t0 = System.nanoTime()
      val n = graft.streaming.StreamingPack.streamIntervalJoin(spark, d).count()
      println(f"[q98] partitions=$parts%-3d ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
    }
    spark.stop()
  }
}
