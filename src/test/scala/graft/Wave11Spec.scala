package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent validations for the round-11 operators.
  *
  *   - q430's energy distance is recomputed BRUTE FORCE in plain Scala
  *     (quantize → md5-minimal panels → pairwise integer micro-distances
  *     → the single common-denominator division) and must match the
  *     engine row for row — no Spark, no SQL, no shared code path.
  *   - q428 (watermark-buffered as-of) must equal q03's batch native
  *     as-of join row for row on the real corpus — the stream ≡ batch
  *     identity without the oracle harness.
  *   - q429's resplit membership must cover exactly q423's flagged
  *     cells, with subs forming a partition into {0, 1}.
  */
class Wave11Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  test("q430 energy distance matches a plain-Scala brute-force recompute") {
    import org.apache.spark.sql.functions._
    // raw inputs, no engine arithmetic: (vec_id, source, float components)
    val rows = graft.core.Tables.embeddings(spark, sf)
      .join(graft.core.Tables.documents(spark, sf)
        .select(col("doc_id").as("vec_id"), col("source")), "vec_id")
      .select("vec_id", "source", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[Float](2).toArray))
    assert(rows.nonEmpty)
    val quant = rows.map { case (id, src, emb) =>
      (id, src, emb.map(x => math.floor(x.toDouble * 1e6).toLong))
    }
    // md5-minimal panel of 16 per source (60-bit hex key, then vec_id)
    val panels = quant.groupBy(_._2).map { case (src, vs) =>
      src -> vs.sortBy(v =>
          (java.lang.Long.parseLong(md5hex(v._1.toString).substring(0, 15), 16), v._1))
        .take(16).map(v => (v._1, v._3)).toSeq
    }
    def dmic(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      math.floor(math.sqrt(s.toDouble)).toLong
    }
    def within(p: Seq[(Long, Array[Long])]): Long =
      (for (x <- p; y <- p if x._1 != y._1) yield dmic(x._2, y._2)).sum
    val expect = (for {
      (sa, pa) <- panels; (sb, pb) <- panels if sa < sb
    } yield {
      val na = pa.size.toLong; val nb = pb.size.toLong
      val sAb = (for (x <- pa; y <- pb) yield dmic(x._2, y._2)).sum
      val sAa = within(pa); val sBb = within(pb)
      val eMicro = (2 * sAb * na * nb - sAa * nb * nb - sBb * na * na) /
        (na * na * nb * nb)
      (sa, sb) -> (na, nb, sAb, sAa, sBb, eMicro)
    }).toMap
    val got = SparkEntry.queries("q430_energy_distance")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7)))
      .toMap
    assert(got === expect)
    // the statistic is nonnegative up to integer truncation
    assert(got.values.forall(_._6 >= -1L))
  }

  test("q433 polynomial-kernel MMD matches a plain-Scala brute-force recompute") {
    import org.apache.spark.sql.functions._
    val rows = graft.core.Tables.embeddings(spark, sf)
      .join(graft.core.Tables.documents(spark, sf)
        .select(col("doc_id").as("vec_id"), col("source")), "vec_id")
      .select("vec_id", "source", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[Float](2).toArray))
    val quant = rows.map { case (id, src, emb) =>
      (id, src, emb.map(x => math.floor(x.toDouble * 1e6).toLong))
    }
    val panels = quant.groupBy(_._2).map { case (src, vs) =>
      src -> vs.sortBy(v =>
          (java.lang.Long.parseLong(md5hex(v._1.toString).substring(0, 15), 16), v._1))
        .take(16).map(v => (v._1, v._3)).toSeq
    }
    def k(a: Array[Long], b: Array[Long]): Long = {
      var dot = 0L; var i = 0
      while (i < a.length) { dot += a(i) * b(i); i += 1 }
      val dm = dot / 1000000000L // JVM / truncates toward zero, like div
      (1000L + dm) * (1000L + dm)
    }
    def within(p: Seq[(Long, Array[Long])]): Long =
      (for (x <- p; y <- p if x._1 != y._1) yield k(x._2, y._2)).sum
    val expect = (for {
      (sa, pa) <- panels; (sb, pb) <- panels
      if sa < sb && pa.size >= 2 && pb.size >= 2
    } yield {
      val na = pa.size.toLong; val nb = pb.size.toLong
      val sAb = (for (x <- pa; y <- pb) yield k(x._2, y._2)).sum
      val sAa = within(pa); val sBb = within(pb)
      val num = sAa * (nb * (nb - 1)) + sBb * (na * (na - 1)) -
        2 * sAb * ((na - 1) * (nb - 1))
      (sa, sb) -> (na, nb, sAb, sAa, sBb, num / ((na * (na - 1)) * (nb * (nb - 1))))
    }).toMap
    val got = SparkEntry.queries("q433_mmd_poly")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7)))
      .toMap
    assert(got.nonEmpty)
    assert(got === expect)
  }

  test("q431 streaming per-term stats equal q424's batch incremental stats row for row") {
    val batch = SparkEntry.queries("q424_bm25_delta")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val stream = SparkEntry.queries("q431_stream_bm25_delta")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty)
    assert(stream === batch)
  }

  test("q428 buffered stream equals q03's batch native as-of join row for row") {
    val batch = SparkEntry.queries("q03_asof_join_native")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val stream = SparkEntry.queries("q428_stream_asof_buffered")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty)
    assert(stream === batch)
  }

  test("q429 splits exactly q423's flagged cells into sub-cells {0,1}") {
    val flagged = SparkEntry.queries("q423_ivf_delta_maintain")(spark, sf)
      .collect().filter(_.getBoolean(6)).map(_.getInt(0)).toSet
    val got = SparkEntry.queries("q429_ivf_resplit")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(got.map(_._1).toSet === flagged)
    assert(got.forall(t => t._2 == 0 || t._2 == 1))
    // sub 0 is never empty (the md5-minimal seed lands there)
    val bySub = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(bySub.values.forall(_.contains(0)))
    // membership is a partition: one row per (cell, vec)
    assert(got.map(t => (t._1, t._3)).distinct.length === got.length)
  }
}
