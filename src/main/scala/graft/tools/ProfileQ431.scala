package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: isolate q431's cost — the stateless HOF pair expansion as a
  * BATCH plan vs the same expansion through the streaming aggregate.
  *
  *   sbt "runMain graft.tools.ProfileQ431 /root/testdata/sf0.1"
  */
object ProfileQ431 {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val delta = s.read.parquet(s"$d/documents.parquet")
      .filter(pmod(col("doc_id"), lit(10L)) === lit(7L))
    val runLenFold =
      "aggregate(ws, " +
        "named_struct('res', CAST(array() AS ARRAY<STRUCT<w: STRING, cnt: BIGINT>>), " +
        "'cur', CAST(NULL AS STRING), 'c', CAST(0 AS BIGINT)), " +
        "(acc, x) -> CASE " +
        "WHEN acc.cur IS NULL THEN named_struct('res', acc.res, 'cur', x, 'c', CAST(1 AS BIGINT)) " +
        "WHEN x = acc.cur THEN named_struct('res', acc.res, 'cur', acc.cur, 'c', acc.c + 1) " +
        "ELSE named_struct('res', array_append(acc.res, named_struct('w', acc.cur, 'cnt', acc.c)), " +
        "'cur', x, 'c', CAST(1 AS BIGINT)) END, " +
        "acc -> CASE WHEN acc.cur IS NULL THEN acc.res " +
        "ELSE array_append(acc.res, named_struct('w', acc.cur, 'cnt', acc.c)) END)"
    val pairs = delta
      .withColumn("ws", array_sort(graft.functions.TextFunctions.tokens(col("text"))))
      .withColumn("prs0", expr(runLenFold))
      .withColumn("dl", expr("aggregate(prs0, CAST(0 AS BIGINT), (a, s) -> a + s.cnt)"))
      .withColumn("prs", expr("concat(prs0, array(named_struct('w', '', 'cnt', dl)))"))
      .select(explode(col("prs")).as("p"))
      .select(col("p.w").as("w"), col("p.cnt").as("cnt"))
    time("batch pairs only")(println("rows=" + pairs.count()))
    time("batch pairs+agg")(println(
      "rows=" + pairs.groupBy("w").agg(count(lit(1)), sum("cnt")).count()))
    time("full q431 (streaming)")(println(
      "rows=" + graft.SparkEntry.queries("q431_stream_bm25_delta")(s, d).count()))
    time("full q431 again")(println(
      "rows=" + graft.SparkEntry.queries("q431_stream_bm25_delta")(s, d).count()))
    s.stop()
  }
}
