package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: sweep the q452 beam-search knobs (graph degree M, beam
  * width, rounds) at a scale factor and print each config's recall vs
  * the q50 brute-force truth — how the shipped constants were chosen.
  * Usage: runMain graft.tools.ProfileHnsw [sfDir] [M,beam,rounds ...]
  */
object ProfileHnsw {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val configs =
      if (args.length > 1) args.drop(1).toSeq.map { c =>
        val Array(m, w, r) = c.split(",").map(_.toInt); (m, w, r)
      } else Seq((16, 16, 4), (16, 16, 6), (24, 24, 4), (32, 24, 4), (32, 32, 4))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for ((m, w, r) <- configs) {
      val t0 = System.nanoTime()
      val out = graft.operators.SimilarityPack
        .hnswRecallProbe(spark, sfDir, m, w, r)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"M=$m%3d beam=$w%3d rounds=$r%2d -> recall=$out%1.3f  (${sec}%5.1f s)")
    }
    spark.stop()
  }
}
