package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: drive library APIs that aren't part of the query registry.
  *
  *   sbt "runMain graft.tools.Demo sessionize /root/testdata/sf0.001"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val what = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    what match {
      case "sessionize" =>
        val ds = graft.streaming.SessionizeStream.run(spark, dir)
        println(s"closed sessions: ${ds.count()}")
        ds.orderBy("user_id", "start_us").show(10, truncate = false)
      case "q41parts" =>
        import org.apache.spark.sql.functions._
        graft.functions.GraftExpressions.ensure(spark)
        import graft.functions.TextFunctions._
        def t[A](label: String)(f: => A): A = {
          val t0 = System.nanoTime(); val r = f
          println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $label"); r
        }
        val docs = graft.core.Tables.documents(spark, dir)
          .select(col("doc_id"), tokenSet(col("text")).as("toks"))
          .filter(size(col("toks")) > 0)
          .withColumn("sigs", expr(
            "transform(sequence(0, 15), p -> array_min(transform(toks, w -> md5(concat(cast(p as string), ':', w)))))"))
          .cache()
        t("docs+sigs")(docs.count())
        val bands = docs.select(col("doc_id"),
          posexplode(array(
            md5(concat_ws(",", slice(col("sigs"), 1, 8))),
            md5(concat_ws(",", slice(col("sigs"), 9, 8))))))
          .toDF("doc_id", "band_id", "band_val").cache()
        t("bands")(bands.count())
        val cand = bands.as("a").join(bands.as("b"),
            col("a.band_id") === col("b.band_id") &&
            col("a.band_val") === col("b.band_val") &&
            col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_i"), col("b.doc_id").as("doc_j"))
        t("cand raw")(cand.count())
        val dist = cand.distinct().cache()
        t("cand distinct")(dist.count())
        val sa = docs.select(col("doc_id").as("doc_i"), col("sigs").as("sig_a"))
        val sb = docs.select(col("doc_id").as("doc_j"), col("sigs").as("sig_b"))
        val est = dist.join(sa, "doc_i").join(sb, "doc_j")
          .withColumn("est_matches",
            graft.functions.GraftExpressions.arrayEqCount(col("sig_a"), col("sig_b")))
          .filter(col("est_matches") >= 12)
        t("est filter")(println("survivors: " + est.count()))
        t("full q41")(println("rows: " +
          graft.operators.DedupPack.queries("q41_dedup_minhash")(spark, dir).count()))
      case other =>
        System.err.println(s"unknown demo: $other")
    }
    spark.stop()
  }
}
