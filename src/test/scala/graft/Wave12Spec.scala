package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent validations for the wave-10 (round-11 tail) operators —
  * each query recomputed BRUTE FORCE in plain Scala (no Spark, no SQL,
  * no shared code path) on the sf0.001 corpus and compared row for row:
  *
  *   - q439 greedy k-center: quantize → md5-min seed → 8 farthest-point
  *     rounds with the (dmin desc, vec_id asc) tie-break.
  *   - q440 k-truss: 3 support-peel rounds over the q118 co-occurrence
  *     edge list + final recount.
  *   - q441 unigram-LM tokenizer: candidate counting, top-48+singles
  *     vocabulary, integer-qln scores, Viterbi with the (score desc,
  *     shorter-last-piece) tie-break, and the usage counts.
  *   - q442 personalized PageRank: 4 seed-teleport walk rounds in
  *     integer micro-units over the near-dup graph.
  *   - q443 KMV resemblance: 64-value sketches, the k-min-of-union
  *     membership estimator, and the exact-Jaccard lane.
  */
class Wave12Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def hex60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

  test("q439 k-center matches a plain-Scala greedy recompute") {
    val pts = graft.core.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray.map(x => math.floor(x.toDouble * 1e6).toLong)))
      .sortBy(_._1)
    assert(pts.nonEmpty)
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val seed = pts.minBy(p => (hex60(s"kc_${p._1}"), p._1))
    var dmin = pts.map(p => (p._1, p._2, d2(p._2, seed._2)))
    val picks = scala.collection.mutable.ArrayBuffer((1, seed._1, 0L))
    for (r <- 2 to 8) {
      val nxt = dmin.maxBy(p => (p._3, -p._1))
      picks += ((r, nxt._1, nxt._3))
      dmin = dmin.map(p => (p._1, p._2, math.min(p._3, d2(p._2, nxt._2))))
    }
    val got = SparkEntry.queries("q439_kcenter_coreset")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === picks.map(p => (p._1, p._2, p._3)).toSeq)
  }

  test("q440 k-truss matches a plain-Scala peel of the co-occurrence graph") {
    val base = graft.operators.PipelinePack.cooccurEdges(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(base.nonEmpty)
    def support(es: Set[(String, String)]): Map[(String, String), Long] = {
      val byA = es.groupBy(_._1).map { case (a, g) => a -> g.map(_._2).toSeq.sorted }
      val tris = for {
        (a, ns) <- byA.toSeq
        i <- ns.indices; j <- (i + 1) until ns.size
        if es.contains((ns(i), ns(j)))
      } yield (a, ns(i), ns(j))
      tris.flatMap { case (x, y, z) => Seq((x, y), (x, z), (y, z)) }
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    }
    var es = base
    for (_ <- 1 to 3) {
      val sup = support(es)
      es = es.filter(e => sup.getOrElse(e, 0L) >= 2)
    }
    val fin = support(es)
    val expect = es.toSeq.sorted.map(e => (e._1, e._2, fin.getOrElse(e, 0L)))
    val got = SparkEntry.queries("q440_ktruss")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === expect)
  }

  test("q442 personalized PageRank matches a plain-Scala walk recompute") {
    val pairs = graft.operators.DedupPack.ngramPairs(spark, sf)
      .select("doc_i", "doc_j").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val edges = pairs.flatMap(p => Seq(p, p.swap)) // (v, u)
    val deg = edges.groupBy(_._1).map { case (v, g) => v -> g.length.toLong }
    var rank: Map[Long, Long] =
      deg.keys.map(v => v -> (if (v % 7 == 0) 1000000L else 0L)).toMap
    for (_ <- 1 to 4) {
      val in = edges.groupBy(_._2).map { case (u, es) =>
        u -> es.map(e => rank(e._1) / deg(e._1)).sum
      }
      rank = deg.keys.map { u =>
        u -> (85L * in.getOrElse(u, 0L) / 100L +
          (if (u % 7 == 0) 150000L else 0L))
      }.toMap
    }
    val expect = rank.toSeq.sortBy(_._1).map { case (v, sc) => (v, sc, v % 7 == 0) }
    val got = SparkEntry.queries("q442_ppr")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got === expect)
  }

  test("q443 KMV resemblance matches a plain-Scala sketch recompute") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val vocab = docs.flatMap { case (src, t) =>
      t.replaceAll("(?U)[^\\w\\s]", "").split("(?U)\\s+").filter(_.nonEmpty)
        .map(w => (src, w))
    }.distinct.map { case (src, w) => (src, hex60(w), w) }
    val sketches = vocab.groupBy(_._1).map { case (src, vs) =>
      src -> vs.map(v => (v._2, v._3)).sorted.take(64).toSet
    }
    val bySrc = vocab.groupBy(_._1).map { case (src, vs) => src -> vs.map(_._3).toSet }
    val srcs = sketches.keys.toSeq.sorted
    val expect = for (a <- srcs; b <- srcs if a < b) yield {
      val merged = (sketches(a) ++ sketches(b)).toSeq.sorted.take(64)
      val kUsed = merged.size.toLong
      val nBoth = merged.count(x => sketches(a)(x) && sketches(b)(x)).toLong
      val nInter = (bySrc(a) & bySrc(b)).size.toLong
      val nUnion = (bySrc(a) | bySrc(b)).size.toLong
      val jEst = 1000000L * nBoth / kUsed
      val jEx = 1000000L * nInter / nUnion
      (a, b, kUsed, nBoth, jEst, jEx, math.abs(jEst - jEx))
    }
    val got = SparkEntry.queries("q443_kmv_jaccard")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === expect)
  }

  test("q445 TPC-H Q17 matches a plain-Scala recompute") {
    import org.apache.spark.sql.functions._
    val li = graft.core.Tables.lineitem(spark, sf)
      .select("l_partkey", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val parts = graft.core.Tables.part(spark, sf)
      .select("p_partkey", "p_brand", "p_size").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .filter(p => p._2 == "Brand#1" && p._3 <= 10).map(_._1).toSet
    val byPart = li.groupBy(_._1)
    val hits = li.filter { case (pk, q, _) =>
      parts(pk) && {
        val g = byPart(pk)
        q < 0.2 * (g.map(_._2).sum / g.length)
      }
    }
    val cents = hits.map(h => BigDecimal(h._3).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100)
      .sum.toLongExact
    val got = SparkEntry.queries("q445_sql_q17")(spark, sf).collect().head
    assert((got.getLong(0), got.getLong(1)) === (hits.length.toLong, cents))
  }

  test("q446 observed metrics are stable across repeated invocations") {
    val a = SparkEntry.queries("q446_observe_metrics")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("q446_observe_metrics")(spark, sf).collect().toSeq
    assert(a === b) // a fixed observation name would throw on the 2nd run
    assert(a.head.getLong(0) > 0L)
  }

  test("q447 dynamic overwrite rewrites en only; other partitions byte-identical") {
    import org.apache.spark.sql.functions._
    SparkEntry.queries("q447_dynamic_overwrite")(spark, sf).collect() // build store
    val key = graft.core.Artifacts.corpusKey(sf, "documents.parquet")
    val store = spark.read.parquet(
      graft.core.Artifacts.materialize(s"docs_dynow_v1_$key")(_ => ()))
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getString(2)))).toMap
    val orig = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getString(2))))
    assert(store.size === orig.length)
    orig.foreach { case (id, (lang, text)) =>
      val want = if (lang == "en") text.toUpperCase else text
      assert(store(id) === ((lang, want)), s"doc $id")
    }
  }

  test("q441 unigram tokenizer matches a plain-Scala Viterbi recompute") {
    val texts = graft.core.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
    val words = texts
      .flatMap(_.replaceAll("(?U)[^\\w\\s]", "").split("(?U)\\s+"))
      .filter(w => w.nonEmpty && w.length <= 10)
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    // candidate substrings (end j, len l ≤ 4), weighted by word count
    val pieceCnt = words.toSeq.flatMap { case (w, c) =>
      for (j <- 1 to w.length; l <- 1 to math.min(4, j))
        yield (w.substring(j - l, j), c)
    }.groupBy(_._1).map { case (p, g) => p -> g.map(_._2).sum }
    val vocab = pieceCnt.filter(_._1.length == 1) ++
      pieceCnt.filter(_._1.length > 1).toSeq
        .sortBy { case (p, c) => (-c, p) }.take(48)
    val tot = vocab.values.sum
    def qln(x: Long): Long = math.floor(math.log(x.toDouble) * 1e6).toLong
    val score = vocab.map { case (p, c) => p -> (qln(c) - qln(tot)) }
    // Viterbi: best total score, tie → SHORTER last piece
    def viterbi(w: String): Seq[String] = {
      val best = Array.fill(w.length + 1)(Long.MinValue)
      val bl = Array.fill(w.length + 1)(0)
      best(0) = 0L
      for (j <- 1 to w.length; l <- 1 to math.min(4, j)) {
        score.get(w.substring(j - l, j)).foreach { sc =>
          if (best(j - l) != Long.MinValue) {
            val cand = best(j - l) + sc
            if (cand > best(j) || (cand == best(j) && l < bl(j))) {
              best(j) = cand; bl(j) = l
            }
          }
        }
      }
      var pos = w.length
      val out = scala.collection.mutable.ArrayBuffer[String]()
      while (pos > 0) { out += w.substring(pos - bl(pos), pos); pos -= bl(pos) }
      out.toSeq
    }
    val usage = words.toSeq.flatMap { case (w, c) => viterbi(w).map(_ -> c) }
      .groupBy(_._1).map { case (p, g) => p -> g.map(_._2).sum }
    val expect = vocab.toSeq.sortBy(_._1).map { case (p, c) =>
      (p, c, score(p), usage.getOrElse(p, 0L))
    }
    val got = SparkEntry.queries("q441_unigram_tok")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expect)
  }
}
