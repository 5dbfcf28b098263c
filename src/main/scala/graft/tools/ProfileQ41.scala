package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions._

/** Dev-only component profile of q41's stages at sf0.1: signature build
  * vs band join vs verify join, to see where its ~5 s actually goes.
  */
object ProfileQ41 {
  private val nPerm = 16

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def t[A](name: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[41] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  -> $r")
    }
    def rot(h: org.apache.spark.sql.Column, p: Int) =
      if (p == 0) h
      else concat(h.substr(lit(2 * p + 1), lit(32 - 2 * p)), h.substr(lit(1), lit(2 * p)))

    val base = Tables.documents(spark, d)
      .select(col("doc_id"), tokenSet(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn("h", transform(col("toks"), w => md5(w)))

    t("tokenize+md5 only") {
      base.select(size(col("h")).as("n")).agg(sum("n")).collect()(0)
    }
    t("+ sorted tid array") {
      base.select(col("doc_id"), sort_array(transform(col("h"), x => hex64(x))).as("tid"))
        .agg(sum(size(col("tid")))).collect()(0)
    }
    t("+ 16-perm signatures") {
      base.select(col("doc_id"),
        array((0 until nPerm).map(p => hex64(array_min(transform(col("h"), x => rot(x, p))))): _*).as("sigs"))
        .agg(sum(size(col("sigs")))).collect()(0)
    }
    t("full q41") {
      graft.SparkEntry.queries("q41_dedup_minhash")(spark, d).count()
    }
    spark.stop()
  }
}
