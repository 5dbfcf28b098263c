package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Pins the streaming IVF argmax ([[StreamingPack.ivfArgmaxCol]])
  * against the batch window-assignment semantics on degenerate input:
  * a zero-norm vector makes every cosine undefined; the batch window
  * (desc cosine sorts NaN highest, ties broken asc cell) picks the MIN
  * cell, and the stream's HOF argmax must pick the same real cell —
  * never the -1 sentinel (r10 ADVICE regression pin).
  */
class IvfArgmaxSpec extends AnyFunSuite {
  private val s = SparkTestSession.spark
  import s.implicits._

  private val cents = Seq(
    (7, Seq(1000000L, 0L), 1000000.0 / 1e6),
    (3, Seq(0L, 1000000L), 1000000.0 / 1e6),
    (5, Seq(707107L, 707107L), math.sqrt(2.0 * 707107L * 707107L) / 1e6))

  private def withCents(rows: Seq[(Long, Seq[Long], Double)]) =
    rows.toDF("vec_id", "q", "norm")
      .crossJoin(broadcast(cents.toDF("cell", "cq", "cnorm")
        .agg(collect_list(struct(col("cell"), col("cq"), col("cnorm"))).as("cents"))))

  test("zero-norm vector gets the min cell, matching the batch window tie-break") {
    val out = withCents(Seq((1L, Seq(0L, 0L), 0.0)))
      .withColumn("best", StreamingPack.ivfArgmaxCol)
      .select($"vec_id", $"best.cell".as("cell"))
      .as[(Long, Int)].collect()
    assert(out === Array((1L, 3)))

    // batch shape: explode, cosine (NaN for the zero vector), window
    // argmax. Under ANSI (the production default) a 0/0 throws before
    // the window ever sees it, so the NaN-ordering claim is pinned on a
    // non-ANSI child session (own SQLConf, shared context).
    val s2 = s.newSession()
    s2.conf.set("spark.sql.ansi.enabled", "false")
    import s2.implicits._
    val batch = Seq((1L, Seq(0L, 0L), 0.0)).toDF("vec_id", "q", "norm")
      .crossJoin(broadcast(cents.toDF("cell", "cq", "cnorm")))
      .withColumn("cos_c",
        expr("CAST(aggregate(zip_with(q, cq, (a, b) -> a * b), " +
          "CAST(0 AS BIGINT), (acc, x) -> acc + x) AS DOUBLE) / 1e12") /
          (col("norm") * col("cnorm")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(desc("cos_c"), asc("cell"))))
      .filter(col("rn") === 1).select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(batch === Array((1L, 3)))
  }

  test("regular vectors pick the true nearest centroid with a real cosine") {
    val out = withCents(Seq(
        (10L, Seq(999999L, 0L), 999999.0 / 1e6),
        (11L, Seq(10L, 999999L), math.sqrt(10.0 * 10 + 999999.0 * 999999) / 1e6)))
      .withColumn("best", StreamingPack.ivfArgmaxCol)
      .select($"vec_id", $"best.cell".as("cell"), $"best.cos".as("cos"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(out.map(t => (t._1, t._2)) === Array((10L, 7), (11L, 3)))
    assert(out.forall(t => t._3 > 0.99))
  }
}
