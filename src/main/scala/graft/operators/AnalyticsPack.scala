package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{QueryPack, Tables}

/** Round-8 wave-4 analytics: the experimentation / forecasting /
  * link-prediction layer a corpus-curation team runs ON TOP of the
  * engine's measurement queries. Same disciplines as the stats suite in
  * [[CleanPack]]: exact integer accumulation (never sum doubles across
  * groups — floor-quantize per group first), value-VOCABULARY rank
  * windows instead of per-row rank windows, calendar- or
  * sources-bounded pair joins, and one final double expression whose
  * text is character-identical in both engines.
  */
object AnalyticsPack extends QueryPack {

  /** chi²_{0.05,df} upper ladder in milli, df 1..25 — covers the
    * sources/arms cardinalities these audits run over (the documents
    * corpus carries 20 sources ⇒ df 19). */
  private[operators] val chi2CritMilliCase: String =
    """CASE CAST(k - 1 AS INT)
      |  WHEN 1 THEN 3841 WHEN 2 THEN 5991 WHEN 3 THEN 7815
      |  WHEN 4 THEN 9488 WHEN 5 THEN 11070 WHEN 6 THEN 12592
      |  WHEN 7 THEN 14067 WHEN 8 THEN 15507 WHEN 9 THEN 16919
      |  WHEN 10 THEN 18307 WHEN 11 THEN 19675 WHEN 12 THEN 21026
      |  WHEN 13 THEN 22362 WHEN 14 THEN 23685 WHEN 15 THEN 24996
      |  WHEN 16 THEN 26296 WHEN 17 THEN 27587 WHEN 18 THEN 28869
      |  WHEN 19 THEN 30144 WHEN 20 THEN 31410 WHEN 21 THEN 32671
      |  WHEN 22 THEN 33924 WHEN 23 THEN 35172 WHEN 24 THEN 36415
      |  WHEN 25 THEN 37652 ELSE 0 END""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- KRUSKAL–WALLIS k-GROUP RANK TEST (Kruskal & Wallis 1952) on
    // document length across sources — the k-group extension of q331's
    // Mann–Whitney (pairwise tests over k sources inflate α; KW is the
    // one-shot omnibus the pairwise drill-down should be gated on).
    // Doubled midranks over the GLOBAL length vocabulary (integer-exact
    // under ties, the q331/q334 machinery; the window runs over the
    // bounded value vocabulary, never per-doc). The identity
    //   H = 3/(N(N+1)) · Σ_h d_h²/n_h ,  d_h = S2_h − n_h(N+1)
    // (S2_h = doubled rank sum; Σ_h d_h = 0 cancels the usual −3(N+1)
    // term) keeps every accumulated quantity a small integer deviation
    // instead of Σ R², so int64 holds to ~10⁹ docs; per-source terms
    // are floor-quantized ×10³ BEFORE the cross-source integer sum (the
    // q346/q350 rule), and the tie-corrected H is ONE single-row double
    // expression. Scale shape: corpus scan collapses map-side to
    // (source, length) counts; everything after is vocab-sized. ----
    "q351_kruskal_wallis" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("source"), col("n_chars").cast("bigint").as("x"))
      val vc = docs.groupBy("x").agg(count(lit(1)).as("ct"))
      // global window over the length VOCABULARY (bounded; q330 rule)
      val wv = Window.orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val r2 = vc.withColumn("cum", sum("ct").over(wv))
        .select(col("x"),
          (lit(2L) * (col("cum") - col("ct")) + col("ct") + 1L).as("r2"))
      val per = docs.groupBy("source", "x").agg(count(lit(1)).as("cs"))
        .join(broadcast(r2), "x")
        .groupBy("source")
        .agg(sum("cs").as("n"), sum(col("cs") * col("r2")).as("s2"))
      val glob = per.agg(sum("n").as("nn"), count(lit(1)).as("k"))
      val ties = vc.agg(sum(expr("ct * ct * ct - ct")).as("tnum"))
      val terms = per.crossJoin(broadcast(glob))
        .withColumn("dev2", col("s2") - col("n") * (col("nn") + 1L))
        .withColumn("t_milli", expr(
          "cast(floor(1000.0 * (cast(dev2 as double) / cast(n as double)) * cast(dev2 as double)) as bigint)"))
      val h = terms
        .agg(sum("t_milli").as("st"), max("nn").as("nn"), max("k").as("k"))
        .crossJoin(broadcast(ties))
        .select(
          expr("cast((3 * st) div (nn * (nn + 1)) as bigint)").as("h_milli"),
          expr(("cast(floor(3.0 * cast(st as double) / (cast(nn as double) * (cast(nn as double) + 1.0)) " +
            "/ (1.0 - cast(tnum as double) / (cast(nn as double) * cast(nn as double) * cast(nn as double) - cast(nn as double)))) as bigint)"))
            .as("h_tie_milli"),
          expr(s"cast(($chi2CritMilliCase) as bigint)").as("crit_milli"))
        .withColumn("reject", col("h_tie_milli") > col("crit_milli"))
      val result = terms.crossJoin(broadcast(h))
        .select(col("source"), col("n").cast("bigint").as("n_docs"),
          col("s2").cast("bigint").as("rank_sum2"),
          col("dev2").cast("bigint").as("dev2"),
          col("t_milli"), col("h_milli"), col("h_tie_milli"),
          col("crit_milli"), col("reject"))
      result.orderBy("source")
    },

    // ---- KENDALL τ-b (Kendall 1938; tau-b tie correction) between
    // monthly order VOLUME and monthly REVENUE — the rank-concordance
    // complement to q200's OLS slope and q335's Theil–Sen (τ asks only
    // "do volume and revenue move together month-over-month", immune to
    // the revenue distribution's heavy tail). Concordant/discordant/
    // tied pair COUNTS are exact integers over the month-calendar pair
    // join (calendar²-bounded, the q335 discipline — ~84 months of
    // TPC-H dates ⇒ ≤3.5k pairs, broadcast nested-loop by design);
    // revenue is cents-quantized BEFORE summing (exact decimal→int64,
    // the q11 idiom). τ-b's denominator is one sqrt on exact integer
    // pair counts — correctly-rounded IEEE, identical text both
    // engines. ----
    "q352_kendall_monthly" -> { (s, d) =>
      val m = Tables.orders(s, d)
        .select(date_trunc("month", col("o_orderdate").cast("timestamp")).as("mon"),
          expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)").as("cents"))
        .groupBy("mon")
        .agg(count(lit(1)).as("x"), sum("cents").as("y"))
      val a = m.select(col("mon").as("mon_a"), col("x").as("xa"), col("y").as("ya"))
      val b = m.select(col("mon").as("mon_b"), col("x").as("xb"), col("y").as("yb"))
      val pairs = a.join(broadcast(b), col("mon_a") < col("mon_b"))
      val agg = pairs.agg(
        count(lit(1)).as("n0"),
        sum(when((col("xa") < col("xb") && col("ya") < col("yb")) ||
                 (col("xa") > col("xb") && col("ya") > col("yb")), 1L)
          .otherwise(0L)).as("nc"),
        sum(when((col("xa") < col("xb") && col("ya") > col("yb")) ||
                 (col("xa") > col("xb") && col("ya") < col("yb")), 1L)
          .otherwise(0L)).as("nd"),
        sum(when(col("xa") === col("xb") && col("ya") =!= col("yb"), 1L)
          .otherwise(0L)).as("tx"),
        sum(when(col("ya") === col("yb") && col("xa") =!= col("xb"), 1L)
          .otherwise(0L)).as("ty"),
        sum(when(col("xa") === col("xb") && col("ya") === col("yb"), 1L)
          .otherwise(0L)).as("txy"))
      val nMonths = m.agg(count(lit(1)).as("n_months"))
      val result = nMonths.crossJoin(broadcast(agg))
        .select(col("n_months").cast("bigint").as("n_months"),
          col("n0").cast("bigint").as("n_pairs"),
          col("nc").cast("bigint").as("n_concordant"),
          col("nd").cast("bigint").as("n_discordant"),
          (col("tx") + col("txy")).cast("bigint").as("ties_x"),
          (col("ty") + col("txy")).cast("bigint").as("ties_y"),
          expr(("cast(floor(1000.0 * (cast(nc as double) - cast(nd as double)) " +
            "/ sqrt((cast(n0 as double) - (cast(tx as double) + cast(txy as double))) " +
            "* (cast(n0 as double) - (cast(ty as double) + cast(txy as double))))) as bigint)"))
            .as("tau_b_milli"))
      result.orderBy("n_months")
    }
  )

  override def oracle: Map[String, String] = Map(

    // identical doubled-midrank vocabulary, identical per-source ×10³
    // floor quantization, identical single-row tie-corrected expression
    "q351_kruskal_wallis" ->
      s"""WITH docs AS (SELECT source, CAST(n_chars AS BIGINT) AS x FROM documents),
        |vc AS (SELECT x, CAST(count(*) AS BIGINT) AS ct FROM docs GROUP BY x),
        |r2 AS (SELECT x, 2 * (CAST(SUM(ct) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - ct) + ct + 1 AS r2
        |       FROM vc),
        |per AS (SELECT sx.source, CAST(SUM(sx.cs) AS BIGINT) AS n,
        |               CAST(SUM(sx.cs * r2.r2) AS BIGINT) AS s2
        |        FROM (SELECT source, x, CAST(count(*) AS BIGINT) AS cs
        |              FROM docs GROUP BY 1, 2) sx
        |        JOIN r2 USING (x)
        |        GROUP BY sx.source),
        |gl AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(count(*) AS BIGINT) AS k FROM per),
        |tie AS (SELECT CAST(SUM(ct * ct * ct - ct) AS BIGINT) AS tnum FROM vc),
        |terms AS (
        |  SELECT p.source, p.n, p.s2, g.nn, g.k,
        |         p.s2 - p.n * (g.nn + 1) AS dev2,
        |         CAST(floor(1000.0 * (CAST(p.s2 - p.n * (g.nn + 1) AS DOUBLE) / CAST(p.n AS DOUBLE)) * CAST(p.s2 - p.n * (g.nn + 1) AS DOUBLE)) AS BIGINT) AS t_milli
        |  FROM per p CROSS JOIN gl g),
        |h AS (
        |  SELECT CAST((3 * SUM(t_milli)) // (MAX(nn) * (MAX(nn) + 1)) AS BIGINT) AS h_milli,
        |         CAST(floor(3.0 * CAST(SUM(t_milli) AS DOUBLE) / (CAST(MAX(nn) AS DOUBLE) * (CAST(MAX(nn) AS DOUBLE) + 1.0)) / (1.0 - CAST(MAX(t.tnum) AS DOUBLE) / (CAST(MAX(nn) AS DOUBLE) * CAST(MAX(nn) AS DOUBLE) * CAST(MAX(nn) AS DOUBLE) - CAST(MAX(nn) AS DOUBLE)))) AS BIGINT) AS h_tie_milli,
        |         CAST((${chi2CritMilliCase.replace("k - 1", "MAX(k) - 1")}) AS BIGINT) AS crit_milli
        |  FROM terms CROSS JOIN tie t)
        |SELECT tm.source, tm.n AS n_docs, tm.s2 AS rank_sum2, tm.dev2,
        |       tm.t_milli, h.h_milli, h.h_tie_milli, h.crit_milli,
        |       h.h_tie_milli > h.crit_milli AS reject
        |FROM terms tm CROSS JOIN h
        |ORDER BY tm.source""".stripMargin,

    // identical cents quantization, identical month-pair counts,
    // identical one-sqrt τ-b expression
    "q352_kendall_monthly" ->
      """WITH m AS (
        |  SELECT date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS mon,
        |         CAST(count(*) AS BIGINT) AS x,
        |         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |pr AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n0,
        |         CAST(SUM(CASE WHEN (a.x < b.x AND a.y < b.y) OR (a.x > b.x AND a.y > b.y) THEN 1 ELSE 0 END) AS BIGINT) AS nc,
        |         CAST(SUM(CASE WHEN (a.x < b.x AND a.y > b.y) OR (a.x > b.x AND a.y < b.y) THEN 1 ELSE 0 END) AS BIGINT) AS nd,
        |         CAST(SUM(CASE WHEN a.x = b.x AND a.y <> b.y THEN 1 ELSE 0 END) AS BIGINT) AS tx,
        |         CAST(SUM(CASE WHEN a.y = b.y AND a.x <> b.x THEN 1 ELSE 0 END) AS BIGINT) AS ty,
        |         CAST(SUM(CASE WHEN a.x = b.x AND a.y = b.y THEN 1 ELSE 0 END) AS BIGINT) AS txy
        |  FROM m a JOIN m b ON a.mon < b.mon),
        |nm AS (SELECT CAST(count(*) AS BIGINT) AS n_months FROM m)
        |SELECT nm.n_months, pr.n0 AS n_pairs, pr.nc AS n_concordant,
        |       pr.nd AS n_discordant,
        |       CAST(pr.tx + pr.txy AS BIGINT) AS ties_x,
        |       CAST(pr.ty + pr.txy AS BIGINT) AS ties_y,
        |       CAST(floor(1000.0 * (cast(nc as double) - cast(nd as double)) / sqrt((cast(n0 as double) - (cast(tx as double) + cast(txy as double))) * (cast(n0 as double) - (cast(ty as double) + cast(txy as double))))) AS BIGINT) AS tau_b_milli
        |FROM nm CROSS JOIN pr
        |ORDER BY n_months""".stripMargin
  )
}
