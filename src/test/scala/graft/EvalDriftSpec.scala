package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

/** Pins the evaluation/drift operators added with q197–q200:
  *   - q197 ROC-AUC: closed-form extremes (perfect separation → 10⁶,
  *     all-ties → exactly ½) of the ×2-integer rank-sum identity;
  *   - q198 NDCG@5: exact agreement with an independent in-JVM
  *     recomputation from the q50 ranking + labels on real sf0.001 data;
  *   - q199 CUSUM: a crafted rate shift lands the changepoint on the
  *     known hour with the hand-computed |S| peak;
  *   - q200 trend slope: an exact integer line recovers slope and
  *     intercept with zero quantization error.
  */
class EvalDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- q197 fixtures: crafted documents ----

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    val tmp = Files.createTempDirectory("graft-auc").toString
    rows.map { case (id, text, lang) => (id, text, lang, "src0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("q197: perfect separation scores AUC exactly 1.0") {
    // every en doc longer than every non-en doc
    val d = docsDir(Seq(
      (1L, "a b c d e", "en"), (2L, "f g h i j", "en"),
      (3L, "x y", "de"), (4L, "z w", "fr")))
    val r = SparkEntry.queries("q197_roc_auc")(spark, d)
      .as[(Long, Long, Long, Long)].collect()
    assert(r.toSeq === Seq((1000000L, 2L, 2L, 2L)))
  }

  test("q197: identical scores tie out to AUC exactly 0.5") {
    val d = docsDir(Seq(
      (1L, "a b c", "en"), (2L, "d e f", "en"),
      (3L, "g h i", "de"), (4L, "j k l", "fr")))
    val r = SparkEntry.queries("q197_roc_auc")(spark, d)
      .as[(Long, Long, Long, Long)].collect()
    assert(r.toSeq === Seq((500000L, 2L, 2L, 1L)))
  }

  // ---- q198: independent recomputation on real sf0.001 data ----

  test("q198: NDCG@5 equals an independent recomputation from q50 + labels") {
    val sfDir = SparkTestSession.sfDir
    val top = SparkEntry.queries("q50_ann_brute")(spark, sfDir)
      .select("q_id", "rk", "vec_id")
      .as[(Long, Int, Long)].collect().toSeq
    val label = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    val w = Array(1000000L, 630929L, 500000L, 430676L, 386852L)
    val expected = top.groupBy(_._1).toSeq.map { case (qid, rows) =>
      val rel = rows.sortBy(_._2).map(r => if (label(r._3) == label(qid)) 1L else 0L)
      val nRel = rel.sum
      val dcg = rel.zip(w).map { case (g, wi) => g * wi }.sum
      val idcg = w.take(nRel.toInt).sum
      val ndcg = if (nRel > 0) (1000000L * dcg) / idcg else 0L
      (qid, label(qid), nRel, dcg, idcg, ndcg)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q198_ndcg_label")(spark, sfDir)
      .as[(Long, Int, Long, Long, Long, Long)].collect().toSeq
    assert(got === expected)
    assert(got.nonEmpty && got.forall(r => r._6 >= 0L && r._6 <= 1000000L))
    spark.catalog.clearCache()
  }

  // ---- q199/q200 fixtures: crafted events ----

  private lazy val eventsDir: String = {
    val tmp = Files.createTempDirectory("graft-drift").toString
    val hourMs = 3600000L
    val dayMs = 86400000L
    val hrBase = 472223L * hourMs  // hour-aligned epoch instant
    val dayBase = 19676L * dayMs   // day-aligned epoch instant
    // "click": 10 consecutive hours, rate 1/h for 5 hours then 5/h —
    // CUSUM S_k = 10·cum − 30·k peaks at |−100| on the 5th hour (k=5)
    val click = (0 until 10).flatMap { h =>
      val n = if (h < 5) 1 else 5
      (0 until n).map(i => (h * 100L + i, new Timestamp(hrBase + h * hourMs + i * 1000L), 1L, "click", 1.0, "{}"))
    }
    // "buy": exact line y = 3 + 2x over days x = 0..4
    val buy = (0 until 5).flatMap { x =>
      (0 until (3 + 2 * x)).map(i =>
        (10000L + x * 100L + i, new Timestamp(dayBase + x * dayMs + i * 1000L), 2L, "buy", 1.0, "{}"))
    }
    (click ++ buy).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("q199: the changepoint lands on the rate-shift hour with the hand-computed peak") {
    val r = SparkEntry.queries("q199_cusum_changepoint")(spark, eventsDir)
      .as[(String, Long, Long, Long, Long)].collect()
      .find(_._1 == "click").get
    assert(r === (("click", 472223L + 4L, 100L, 10L, 30L)))
  }

  test("q200: an exact integer line recovers slope and intercept exactly") {
    val r = SparkEntry.queries("q200_trend_slope")(spark, eventsDir)
      .as[(String, Long, Long, Long, Long)].collect()
      .find(_._1 == "buy").get
    // y = 3 + 2x fits exactly: slope 2.0 → 2_000_000, intercept 3.0 → 3_000_000
    assert(r === (("buy", 5L, 35L, 2000000L, 3000000L)))
  }

  test("q200: a two-day stream crossing midnight uses per-type day offsets") {
    // "click" spans hour 23 of one day (1 event) and the next day (29):
    // x = (0, 1), y = (1, 29) → slope 28.0, intercept 1.0 exactly
    val r = SparkEntry.queries("q200_trend_slope")(spark, eventsDir)
      .as[(String, Long, Long, Long, Long)].collect()
      .find(_._1 == "click").get
    assert(r === (("click", 2L, 30L, 28000000L, 1000000L)))
  }
}
