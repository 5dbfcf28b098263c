package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent validations for the round-9 operators: the skyline
  * against a brute-force dominance check, Kendall's tau-b against the
  * O(n²) pairwise definition on the real sf0.001 corpus, triplet-mining
  * invariants, curriculum-interleave structure, HITS normalization
  * bounds, the token-budget greedy prefix property, and the
  * Holm-vs-BH containment.
  */
class Wave9Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q399 skyline equals the brute-force Pareto frontier") {
    val rows = SparkEntry.queries("q399_skyline")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val all = graft.core.Tables.part(spark, sf)
      .selectExpr("p_partkey",
        "CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents",
        "CAST(p_size AS BIGINT) AS size")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def dominated(p: (Long, Long, Long)): Boolean = all.exists { o =>
      o._1 != p._1 && o._2 <= p._2 && o._3 >= p._3 &&
        (o._2 < p._2 || o._3 > p._3)
    }
    val expected = all.filterNot(dominated)
      .map(p => (p._1, p._2, p._3)).sortBy(p => (p._2, p._1))
    assert(rows.toSeq === expected.toSeq)
    assert(rows.nonEmpty)
  }

  test("q409 Kendall tau-b matches the O(n^2) pairwise definition") {
    val out = SparkEntry.queries("q409_kendall_tau")(spark, sf).collect()(0)
    // recompute the bucketed (x, y) pairs exactly as the query does
    import org.apache.spark.sql.functions._
    val pts = graft.core.Tables.documents(spark, sf)
      .select(expr("n_chars div 16").cast("long").as("x"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("yt"))
      .selectExpr("x", "yt div 8 AS y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var c = 0L; var d = 0L; var tx = 0L; var ty = 0L
    for (i <- pts.indices; j <- (i + 1) until pts.length) {
      val s = (pts(i)._1 - pts(j)._1).sign * (pts(i)._2 - pts(j)._2).sign
      if (s > 0) c += 1 else if (s < 0) d += 1
      if (pts(i)._1 == pts(j)._1) tx += 1
      if (pts(i)._2 == pts(j)._2) ty += 1
    }
    assert(out.getAs[Long]("concordant") == c)
    assert(out.getAs[Long]("discordant") == d)
    assert(out.getAs[Long]("ties_x") == tx)
    assert(out.getAs[Long]("ties_y") == ty)
    val n0 = pts.length.toLong * (pts.length - 1) / 2
    val tau = math.floor(1000.0 * (c - d).toDouble /
      math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble)).toLong
    assert(out.getAs[Long]("tau_b_milli") == tau)
  }

  test("q406 triplet invariants: labels, violates flag, hardest-direction") {
    val rows = SparkEntry.queries("q406_triplet_mining")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cosPos = r.getAs[Double]("cos_pos")
      val cosNeg = r.getAs[Double]("cos_neg")
      assert(r.getAs[Boolean]("violates") == (cosNeg >= cosPos))
      assert(r.getAs[Long]("pos_id") != r.getAs[Long]("q_id"))
      assert(r.getAs[Long]("neg_id") != r.getAs[Long]("q_id"))
      assert(cosPos >= -1.0001 && cosPos <= 1.0001)
      assert(cosNeg >= -1.0001 && cosNeg <= 1.0001)
    }
  }

  test("q405 curriculum: per-source ranks dense from 1, interleave round-robin") {
    val rows = SparkEntry.queries("q405_curriculum")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("rk"), r.getAs[Long]("src_idx"), r.getAs[Long]("position")))
    val k = rows.map(_._4).max + 1
    // ranks dense 1..n_s per source
    rows.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // position arithmetic and uniqueness
    rows.foreach { case (_, _, rk, idx, pos) => assert(pos == (rk - 1) * k + idx) }
    assert(rows.map(_._5).distinct.length == rows.length)
    // the first k positions (when every source is nonempty) are the
    // k distinct sources' rank-1 docs — the round-robin property
    val firstK = rows.sortBy(_._5).take(k.toInt)
    assert(firstK.map(_._2).distinct.length == k.toInt)
    assert(firstK.forall(_._3 == 1L))
  }

  test("q400 HITS: scores in (0, 1e6], max normalized to exactly 1e6") {
    val rows = SparkEntry.queries("q400_hits")(spark, sf).collect()
      .map(r => (r.getAs[String]("entity"), r.getAs[Long]("score_q")))
    for (ent <- Seq("auth", "hub")) {
      val ss = rows.filter(_._1 == ent).map(_._2)
      assert(ss.nonEmpty)
      assert(ss.max == 1000000L, s"$ent max must be the L-inf normalizer")
      assert(ss.forall(v => v >= 0L && v <= 1000000L))
    }
  }

  test("q408 greedy budget: selection is a quality-ordered prefix within budget") {
    val res = SparkEntry.queries("q408_token_budget_select")(spark, sf).collect()
    val totTok = res.map(_.getAs[Long]("tok_total")).sum
    val selTok = res.map(_.getAs[Long]("tok_sel")).sum
    val budget = res.head.getAs[Long]("budget")
    assert(budget == totTok * 3 / 10)
    assert(selTok <= budget)
    // greedy: adding the next-best doc would exceed the budget, so the
    // selected mass is within one max-doc of it
    val maxDoc = graft.core.Tables.documents(spark, sf)
      .selectExpr("size(filter(split(regexp_replace(text, '(?U)[^\\\\w\\\\s]', ''), '(?U)\\\\s+'), w -> length(w) > 0)) AS t")
      .agg(org.apache.spark.sql.functions.max("t")).collect()(0).getInt(0).toLong
    assert(selTok + maxDoc >= budget)
  }

  test("SkylineStream.update emits exactly the frontier-entering points across batches") {
    import graft.streaming.SkylineStream
    import graft.streaming.SkylineStream.{Pt, Frontier}
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val st = TestGroupState.create[Frontier](
      org.apache.spark.api.java.Optional.empty[Frontier](),
      GroupStateTimeout.NoTimeout, 0L,
      org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    // batch 1: B shares A's price with a smaller size -> dominated on
    // arrival, never emitted
    val out1 = SkylineStream.update(0L,
      Iterator(Pt(1L, 100L, 5L), Pt(2L, 100L, 3L)), st).toList
    assert(out1.map(_.p_partkey) == List(1L))
    assert(st.get.pts.toSet == Set((100L, 5L)))
    // batch 2: (90, 5) strictly dominates the stored frontier point
    // (enters + prunes it); an exact re-arrival of (100, 5) is now
    // dominated and silent
    val out2 = SkylineStream.update(0L,
      Iterator(Pt(3L, 90L, 5L), Pt(4L, 100L, 5L)), st).toList
    assert(out2.map(_.p_partkey) == List(3L))
    assert(st.get.pts.toSet == Set((90L, 5L)))
    // batch 3: an equal point to the frontier (neither strict) is
    // mutually non-dominating and must be emitted
    val out3 = SkylineStream.update(0L, Iterator(Pt(5L, 90L, 5L)), st).toList
    assert(out3.map(_.p_partkey) == List(5L))
    assert(st.get.pts.toSet == Set((90L, 5L)))
  }

  test("q415 recursive streaks reproduce a designed two-user fixture") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_w9_streak").toString
    def ts(day: Int): java.sql.Timestamp =
      new java.sql.Timestamp(day * 86400000L + 3600000L)
    // user 1: days 10,11,12 then 20,21 -> max streak 3 starting day 10;
    // user 2: single day 15 -> streak 1
    val evs = Seq(10, 11, 12, 20, 21).zipWithIndex.map { case (d, i) =>
      (i.toLong, ts(d), 1L, "view", 1.0, "{}")
    } ++ Seq((99L, ts(15), 2L, "view", 1.0, "{}"))
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q415_streak_recursive")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 3L, 10L), (2L, 1L, 15L)))
  }

  test("q417 Pettitt locates a designed level shift") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_w9_pettitt").toString
    def ts(day: Int, i: Int): java.sql.Timestamp =
      new java.sql.Timestamp(day * 86400000L + i * 60000L)
    // days 100..109 at 1 event/day, days 110..119 at 3 events/day:
    // clean level shift after day 109. Doubled midranks: low days all
    // 11, so U_10 = 110 - 10*21 = -100 -> K = 100 at t = 10.
    var id = 0L
    val evs = (100 to 109).flatMap { d => id += 1; Seq((id, ts(d, 0), d.toLong, "view", 1.0, "{}")) } ++
      (110 to 119).flatMap { d =>
        (0 until 3).map { i => id += 1; (id, ts(d, i), d.toLong, "view", 1.0, "{}") }
      }
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q417_pettitt")(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_days") == 20L)
    assert(r.getAs[Long]("k_stat") == 100L)
    assert(r.getAs[Long]("change_day") == 109L)
    assert(r.getAs[Boolean]("reject_stable"))
  }

  test("q419 Cochran-Armitage flags a designed monotone dose-response") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_w9_ca").toString
    (1 to 100).map(k => (k.toLong, f"Customer#$k%09d", 0, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // pre-period spend = custkey dollars -> decile 0 holds custkeys
    // 100..91, ...; post-period purchase only for custkeys > 50 ->
    // conversion is 100% in deciles 0-4 and 0% in 5-9: a perfect
    // decreasing dose-response (T = -12500 on the designed counts)
    val pre = (1 to 100).map(k =>
      (k.toLong, k.toLong, "O", k.toDouble, ts("1997-06-01"), "1-URGENT"))
    val post = (51 to 100).map(k =>
      (1000L + k, k.toLong, "O", 1.0, ts("1998-06-01"), "1-URGENT"))
    (pre ++ post).toDF("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = SparkEntry.queries("q419_cochran_armitage")(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_users") == 100L)
    assert(r.getAs[Long]("n_converted") == 50L)
    assert(r.getAs[Long]("t_stat") == -12500L)
    assert(r.getAs[String]("trend") == "decreasing")
  }

  test("q407 Holm rejects a subset of q371 BH rejections") {
    val bh = SparkEntry.queries("q371_ks_fdr")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Boolean]("reject_fdr")).toMap
    val holm = SparkEntry.queries("q407_holm_fwer")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Boolean]("reject_fwer")).toMap
    assert(holm.keySet == bh.keySet)
    holm.foreach { case (k, rej) => if (rej) assert(bh(k), s"Holm rejected $k but BH did not") }
  }
}
