package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent validations for the round-10 operators. The headline pin
  * is the q415 ≡ q420 dual-formulation identity: the recursive-CTE
  * streak metric and its gaps-and-islands twin must agree ROW FOR ROW
  * on the real corpus (they already share one DuckDB oracle text — the
  * q164/q168 discipline — but the in-repo pin catches a divergence
  * without needing the oracle harness).
  */
class Wave10Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q420 gaps-and-islands streaks equal q415 recursive streaks row-for-row") {
    val rec = SparkEntry.queries("q415_streak_recursive")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val isl = SparkEntry.queries("q420_streak_islands")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rec.nonEmpty)
    assert(isl === rec)
  }

  test("q420 reproduces the designed two-user fixture (q415's fixture)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_w10_streak").toString
    def ts(day: Int): java.sql.Timestamp =
      new java.sql.Timestamp(day * 86400000L + 3600000L)
    // user 1: days 10,11,12 then 20,21 -> max streak 3 starting day 10;
    // user 2: single day 15 -> streak 1. Tie case: user 3 has two
    // length-2 streaks (30,31 and 40,41) -> earliest start day 30 wins.
    val evs = Seq(10, 11, 12, 20, 21).zipWithIndex.map { case (d, i) =>
      (i.toLong, ts(d), 1L, "view", 1.0, "{}")
    } ++ Seq((99L, ts(15), 2L, "view", 1.0, "{}")) ++
      Seq(30, 31, 40, 41).zipWithIndex.map { case (d, i) =>
        (200L + i, ts(d), 3L, "view", 1.0, "{}")
      }
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q420_streak_islands")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 3L, 10L), (2L, 1L, 15L), (3L, 2L, 30L)))
    // and the recursive lane agrees on the tie-breaking fixture too
    val rec = SparkEntry.queries("q415_streak_recursive")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rec === got)
  }

  test("q424 incremental df/cf equal a direct full-corpus recompute per touched term") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q424_bm25_delta")(spark, sf)
      .select("term", "df_new", "cf_new").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got.nonEmpty)
    // independent direct formulation: full-corpus tf, no base/delta split
    val full = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
      .groupBy("w").agg(count(lit(1)).as("df"), sum("cnt").as("cf"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    for ((term, (df, cf)) <- got) {
      assert(full(term) === (df, cf), s"df/cf mismatch for $term")
    }
  }

  test("q425 streamed assignments equal a brute-force in-memory argmax") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q425_stream_ivf_assign")(spark, sf)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got.nonEmpty)
    val cents = graft.operators.SimilarityPack.baseCentroidRow(spark, sf)
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getInt(0), r.getSeq[Long](1).toArray, r.getDouble(2)))
    val deltas = graft.core.Tables.embeddings(spark, sf)
      .filter(pmod(col("vec_id"), lit(10L)) === lit(7L))
      .select(col("vec_id"),
        graft.functions.VectorFunctions.quantize(col("embedding")).as("q"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    assert(deltas.length == got.size)
    for ((id, q) <- deltas) {
      val norm = math.sqrt(q.map(x => x * x).sum.toDouble / 1e12)
      var bestCell = -1; var bestCos = Double.NegativeInfinity
      for ((cell, cq, cnorm) <- cents) {
        val cos = (q.zip(cq).map { case (a, b) => a * b }.sum.toDouble / 1e12) /
          (norm * cnorm)
        if (cos > bestCos || (cos == bestCos && cell < bestCell)) {
          bestCell = cell; bestCos = cos
        }
      }
      assert(got(id) == bestCell, s"vec $id: stream ${got(id)} vs brute $bestCell")
    }
  }

  test("q426 CvM statistic equals the per-observation brute-force definition") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q426_cvm_two_sample")(spark, sf)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(4))).toMap
    assert(got.nonEmpty)
    val bySource = graft.core.Tables.documents(spark, sf)
      .select(col("source"), col("n_chars").cast("long").as("len"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for (((sa, sb), tgot) <- got) {
      val (la, lb) = (bySource(sa), bySource(sb))
      val (na, nb) = (BigInt(la.length), BigInt(lb.length))
      // per pooled observation x: d(x) = cumA(x)*nb - cumB(x)*na
      val s = (la ++ lb).map { x =>
        val d = BigInt(la.count(_ <= x)) * nb - BigInt(lb.count(_ <= x)) * na
        d * d
      }.sum
      val t = (s * 1000000) / (na * nb * (na + nb) * (na + nb))
      assert(BigInt(tgot) == t, s"pair ($sa,$sb): spark $tgot vs brute $t")
    }
  }

  test("q427 AD statistic equals the per-value brute-force definition") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q427_anderson_darling")(spark, sf)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(4))).toMap
    assert(got.nonEmpty)
    val bySource = graft.core.Tables.documents(spark, sf)
      .select(col("source"), col("n_chars").cast("long").as("len"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    for (((sa, sb), agot) <- got) {
      val (la, lb) = (bySource(sa), bySource(sb))
      val (na, nb) = (BigInt(la.length), BigInt(lb.length))
      val nn = na + nb
      val a2 = (la ++ lb).distinct.sorted.map { v =>
        val (cumA, cumB) = (BigInt(la.count(_ <= v)), BigInt(lb.count(_ <= v)))
        val bbv = cumA + cumB
        if (bbv == 0 || bbv == nn) BigInt(0)
        else {
          val l = BigInt(la.count(_ == v) + lb.count(_ == v))
          val d = cumA * nb - cumB * na
          (l * d * d * 1000000) / (na * nb * bbv * (nn - bbv))
        }
      }.sum
      assert(BigInt(agot) == a2, s"pair ($sa,$sb): spark $agot vs brute $a2")
    }
  }

  test("q421 _metadata file_size/file_path match the filesystem (oracle can't see them)") {
    import org.apache.spark.sql.functions._
    val p = java.nio.file.Paths.get(sf, "customer.parquet")
    val row = graft.core.Tables.table(spark, sf, "customer")
      .select(col("_metadata.file_name").as("name"),
        col("_metadata.file_size").as("size"),
        col("_metadata.file_path").as("path"))
      .distinct().collect()
    assert(row.length == 1, "single-file table must yield one metadata row")
    assert(row(0).getAs[String]("name") == "customer.parquet")
    assert(row(0).getAs[Long]("size") == java.nio.file.Files.size(p))
    assert(row(0).getAs[String]("path").endsWith("/customer.parquet"))
  }
}
