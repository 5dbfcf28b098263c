package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins q251's paragraph-Bloom dedup semantics on a hand-built corpus:
  * the Bloom filter is a pruning device only — the exact base-set join
  * removes its false positives, so the gated output must equal a plain
  * (no-Bloom) recomputation, and hand-placed duplicated paragraphs must
  * come out with the expected fractions and keep verdicts.
  */
class ParagraphBloomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 16-token paragraphs, distinct filler per slot so cross-paragraph
  // collisions are impossible by construction
  private def para(tag: String): String =
    (0 until 16).map(i => s"$tag$i").mkString(" ")

  private lazy val dir: String = {
    val tmp = Files.createTempDirectory("graft-parabloom").toString
    // base docs: ids 1,2 (non-delta). delta docs: ids 7,17,27 (%10==7).
    //   doc 7: both paragraphs in base → dup_frac 100%, dropped
    //   doc 17: one of two in base → 50%, dropped (> 30%)
    //   doc 27: one of four in base → 25%, kept
    Seq(
      (1L, s"${para("a")} ${para("b")}", "en", "s0", 0L),
      (2L, s"${para("c")}", "en", "s0", 0L),
      (7L, s"${para("a")} ${para("b")}", "en", "s0", 0L),
      (17L, s"${para("c")} ${para("d")}", "en", "s0", 0L),
      (27L, s"${para("e")} ${para("f")} ${para("g")} ${para("a")}", "en", "s0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("hand-placed duplicates produce the expected fractions and verdicts") {
    val rows = SparkEntry.queries("q251_paragraph_bloom_dedup")(spark, dir)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(rows === Seq(
      (7L, 2L, 2L, 1000000L, false),
      (17L, 2L, 1L, 500000L, false),
      (27L, 4L, 1L, 250000L, true)))
    spark.catalog.clearCache()
  }

  test("bloom-pruned result equals the plain exact join (no false positives survive)") {
    val gated = SparkEntry.queries("q251_paragraph_bloom_dedup")(spark, dir)
      .orderBy("doc_id").collect().toSeq
    // plain recomputation with no filter in the path
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    def paras(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"),
        explode(sequence(lit(0),
          ceil(size(col("toks")) / lit(16.0)).cast("int") - 1)).as("i"),
        col("toks"))
      .select(col("doc_id"), graft.functions.TextFunctions.hex64(
        md5(concat_ws(" ", slice(col("toks"), col("i") * 16 + 1, lit(16))))).as("pid"))
    val all = spark.read.parquet(s"$dir/documents.parquet")
    val basePids = paras(all.filter(pmod(col("doc_id"), lit(10L)) =!= 7L))
      .select("pid").distinct()
    val delta = paras(all.filter(pmod(col("doc_id"), lit(10L)) === 7L))
    val plain = delta.join(basePids.withColumn("hit", lit(1L)), Seq("pid"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("bigint").as("n_paras"),
        coalesce(sum(col("hit")), lit(0L)).cast("bigint").as("n_dup"))
      .select(col("doc_id"), col("n_paras"), col("n_dup"),
        expr("n_dup * 1000000 div n_paras").cast("bigint").as("dup_frac_ppm"))
      .withColumn("keep", col("dup_frac_ppm") <= 300000)
      .orderBy("doc_id").collect().toSeq
    assert(gated === plain)
    spark.catalog.clearCache()
  }
}
