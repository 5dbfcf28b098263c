package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions._

/** Dev-only component profile of q43 at sf0.1. */
object ProfileQ43 {
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
      println(f"[ab] $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s  -> $r")
    }

    def shingles() = Tables.documents(spark, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(array_distinct(wordShinglesOf(col("toks"), 3))).as("s"))

    t("tokenize only") {
      Tables.documents(spark, d).select(size(tokens(col("text"))).as("n")).agg(sum("n")).collect()(0)
    }
    t("shingle explode") { shingles().count() }
    t("shingle+md5+conv") { shingles().select(col("doc_id"), hex64(md5(col("s"))).as("sid")).count() }
    val sh = shingles().select(col("doc_id"), hex64(md5(col("s"))).as("sid")).persist()
    t("persist sh") { sh.count() }
    t("counts") { sh.groupBy("doc_id").agg(count(lit(1))).count() }
    t("join pairs (no agg)") {
      sh.as("a").join(sh.as("b"),
        col("a.sid") === col("b.sid") && col("a.doc_id") < col("b.doc_id")).count()
    }
    t("join+groupBy pair") {
      sh.as("a").join(sh.as("b"),
        col("a.sid") === col("b.sid") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("b.doc_id")).agg(count(lit(1))).count()
    }
    spark.stop()
  }
}
