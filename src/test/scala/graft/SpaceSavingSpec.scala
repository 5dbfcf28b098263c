package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The SpaceSaving sketch's two regimes:
  *
  *  - exact (capacity >= distinct count): provably identical to the exact
  *    [[graft.functions.TopKTokens]] aggregate — this is the regime the
  *    registered gate query (q69) runs in;
  *  - capped (capacity < distinct count): the 100 TB regime, where the
  *    classic guarantees must hold — overestimate-only, error bounded by
  *    N/capacity, and every true heavy hitter retained — across Spark's
  *    partial-buffer merges (repartitioned input forces real merge()s).
  */
class SpaceSavingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def parse(arr: Seq[String]): Seq[(String, Long)] =
    arr.map { s =>
      val i = s.lastIndexOf(':')
      (s.substring(0, i), s.substring(i + 1).toLong)
    }

  test("exact regime: sketch output equals the exact top-k aggregate") {
    graft.functions.GraftExpressions.ensure(spark)
    val df = graft.core.Tables.documents(spark, SparkTestSession.sfDir)
      .select(col("lang"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
    df.createOrReplaceTempView("ss_tok")
    val exact = spark.sql(
      "SELECT lang, graft_top_k_tokens(w, 5) AS t FROM ss_tok GROUP BY lang ORDER BY lang")
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    val sketch = spark.sql(
      "SELECT lang, graft_top_k_spacesaving(w, 5, 64) AS t FROM ss_tok GROUP BY lang ORDER BY lang")
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    assert(sketch.toSeq == exact.toSeq)
  }

  test("capped regime: overestimate-only, bounded error, heavy hitters captured") {
    graft.functions.GraftExpressions.ensure(spark)
    import spark.implicits._
    // skewed stream: 2 heavy hitters over a 200-key singleton tail
    val rows = Seq.fill(500)("hot1") ++ Seq.fill(300)("hot2") ++
      (0 until 200).map(i => f"tail$i%03d")
    val n = rows.size
    val capacity = 16
    // repartition(8) forces multiple partial buffers and real merge()s
    val df = rows.toDF("w").repartition(8)
    df.createOrReplaceTempView("ss_skew")
    // k == capacity dumps every retained counter
    val est = parse(spark.sql(
      s"SELECT graft_top_k_spacesaving(w, $capacity, $capacity) AS t FROM ss_skew")
      .head().getSeq[String](0)).toMap
    val bound = n.toDouble / capacity // 1000/16 = 62.5
    // guaranteed capture: true(x) > N/capacity => retained
    assert(est.contains("hot1") && est.contains("hot2"),
      s"heavy hitters missing from $est")
    // overestimate-only with bounded error, per retained counter
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for ((w, e) <- est) {
      val t = truth(w)
      assert(e >= t, s"$w underestimated: est=$e true=$t")
      assert(e <= t + bound, s"$w error above N/capacity: est=$e true=$t bound=$bound")
    }
    // the sketch never holds more than `capacity` counters
    assert(est.size <= capacity)
  }

  test("builder rejects bad k/capacity literals with a clear error") {
    graft.functions.GraftExpressions.ensure(spark)
    def fails(sql: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("graft_top_k_spacesaving")), s"opaque error: $e")
    }
    fails("SELECT graft_top_k_spacesaving(w, 0, 4) FROM VALUES ('a') AS v(w)")
    fails("SELECT graft_top_k_spacesaving(w, 5, 4) FROM VALUES ('a') AS v(w)")   // capacity < k
    fails("SELECT graft_top_k_spacesaving(w, 2L, 4) FROM VALUES ('a') AS v(w)")  // non-int k
    fails("SELECT graft_top_k_spacesaving(w, CAST(NULL AS INT), 4) FROM VALUES ('a') AS v(w)")
    fails("SELECT graft_top_k_spacesaving(w, 2) FROM VALUES ('a') AS v(w)")      // arity
  }
}
