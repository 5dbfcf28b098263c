package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{QueryPack, Tables}
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  *   - q50: brute-force exact cosine top-k — the correctness baseline.
  *     O(Q·N) with Q small; the plan is a broadcast of the Q query vectors
  *     against a single scan of the corpus (no shuffle of the big side).
  *   - q51: random-hyperplane LSH bucketing — the scale path. Each vector
  *     is assigned a 6-bit signature (sign of projection onto 6 fixed
  *     pseudo-random hyperplanes); search touches only the query's bucket.
  *     At 100 TB the corpus is written bucket-partitioned, so a query
  *     reads one partition (partition pruning), and the bucket join is an
  *     equi-join — no all-pairs anywhere.
  *
  * The hyperplanes are derived deterministically from md5 (computed once
  * here in Scala, inlined as literals into BOTH the Spark plan and the
  * DuckDB oracle), so both engines see the identical structure. All inner
  * products use the exact fixed-point arithmetic of
  * [[graft.functions.VectorFunctions]].
  */
object SimilarityPack extends QueryPack {

  private[operators] val dim = 64
  private[operators] val nPlanes = 6
  private[operators] val topK = 5

  /** Deterministic hyperplane coefficients c(h)(i) ∈ [-8, 7]: the first
    * md5 nibble of "h:i", minus 8. Same derivation any engine could
    * reproduce; inlined as literals on both sides.
    */
  private[operators] val planes: Seq[Seq[Int]] = {
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5")
        .digest(s.getBytes(StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    (0 until nPlanes).map(h =>
      (0 until dim).map(i => Integer.parseInt(md5hex(s"$h:$i").substring(0, 1), 16) - 8))
  }

  /** Spark: 6-bit LSH bucket of a quantized vector column. Integer math
    * throughout — exact under any evaluation order.
    */
  private[operators] def bucketCol(q: Column): Column =
    (0 until nPlanes).map { h =>
      val coeffs = array(planes(h).map(c => lit(c.toLong)): _*)
      val proj = graft.functions.GraftExpressions.longArrayDot(q, coeffs)
      when(proj >= 0, lit(1 << h)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Quantized + normed + bucketed vector table (lazy plan). */
  private[operators] def vecTable(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftExpressions.ensure(s)
    Tables.embeddings(s, d)
      .select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("norm", sqrt(normSqQ(col("q"))))
      .withColumn("bucket", bucketCol(col("q")))
  }

  /** [[vecTable]] persisted + eagerly built: every ANN query references
    * the vector table from at least two plan branches (query side +
    * corpus side of the self-join), which against a lazy plan re-derives
    * quantization, norms and buckets per branch. One persisted build per
    * query, released via `materialized`. At cluster scale this is the
    * precomputed vector index table every ANN system maintains.
    */
  private[operators] def persistedVecs(s: SparkSession, d: String): DataFrame =
    warmed(vecTable(s, d))

  // ---- method bodies over a shared vector table (q54 composes them
  // without rebuilding it per method) ----

  private def bruteTopK(vecs: DataFrame): DataFrame = {
    val queriesDf = vecs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("q").as("qq"), col("norm").as("qnorm"))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("cosine"), asc("vec_id"))
    queriesDf.join(vecs, col("vec_id") =!= col("q_id"))
      .withColumn("cosine", cosineQ(col("qq"), col("q"), col("qnorm"), col("norm")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("q_id"), col("rk"), col("vec_id"), col("cosine"))
  }

  private def lshTopK(vecs: DataFrame): DataFrame = {
    val queriesDf = vecs.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("q").as("qq"),
              col("norm").as("qnorm"), col("bucket").as("qbucket"))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("cosine"), asc("vec_id"))
    queriesDf.join(vecs,
        col("bucket") === col("qbucket") && col("vec_id") =!= col("q_id"))
      .withColumn("cosine", cosineQ(col("qq"), col("q"), col("qnorm"), col("norm")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("q_id"), col("rk"), col("vec_id"), col("bucket"), col("cosine"))
  }

  private def multiprobeTopK(vecs: DataFrame): DataFrame = {
    val probes = vecs.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("q").as("qq"),
              col("norm").as("qnorm"), col("bucket").as("qbucket"))
      .withColumn("flip",
        explode(array((lit(0) +: (0 until nPlanes).map(h => lit(1 << h))): _*)))
      .select(col("q_id"), col("qq"), col("qnorm"),
        expr("int(qbucket ^ flip)").as("probe_bucket"))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("cosine"), asc("vec_id"))
    probes.join(vecs,
        col("bucket") === col("probe_bucket") && col("vec_id") =!= col("q_id"))
      .withColumn("cosine", cosineQ(col("qq"), col("q"), col("qnorm"), col("norm")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("q_id"), col("rk"), col("vec_id"), col("cosine"))
  }

  /** IVF search over a shared vector table. Returns the result plus the
    * persisted cell-assignment table for the caller to release. */
  private def ivfTopK(vecs: DataFrame): (DataFrame, DataFrame) = {
    val seeds = vecs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("seed_id"), col("q").as("sq"), col("norm").as("snorm"))
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(desc("cos_seed"), asc("seed_id"))
    // the 2-nearest-cells assignment feeds BOTH the cell table and the
    // probe table; warmed (persist + eager build), else the two branches
    // race the cold cache and each re-runs the crossJoin + window
    val ranked = warmed(vecs.crossJoin(broadcast(seeds))
      .withColumn("cos_seed", cosineQ(col("q"), col("sq"), col("norm"), col("snorm")))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") <= 2)
      .select(col("vec_id"), col("q"), col("norm"), col("seed_id"), col("arn")))
    val cells = ranked.filter(col("arn") === 1)
      .select(col("vec_id"), col("q"), col("norm"), col("seed_id").as("cell"))
    val probes = ranked.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("q").as("qq"),
              col("norm").as("qnorm"), col("seed_id").as("probe_cell"))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("cosine"), asc("vec_id"))
    val result = probes.join(cells,
        col("cell") === col("probe_cell") && col("vec_id") =!= col("q_id"))
      .withColumn("cosine", cosineQ(col("qq"), col("q"), col("qnorm"), col("norm")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("q_id"), col("rk"), col("vec_id"), col("cell"), col("cosine"))
    (result, ranked)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- exact cosine top-k, brute force (baseline) ----
    "q50_ann_brute" -> { (s, d) =>
      val vecs = persistedVecs(s, d)
      materialized(bruteTopK(vecs), vecs).orderBy("q_id", "rk")
    },

    // ---- LSH-bucketed ANN (scale path) ----
    "q51_ann_lsh" -> { (s, d) =>
      val vecs = persistedVecs(s, d)
      materialized(lshTopK(vecs), vecs).orderBy("q_id", "rk")
    },

    // ---- IVF (inverted-file) ANN: coarse cells from 8 deterministic
    // seed vectors (vec_id < 8); every vector is assigned to its nearest
    // seed by exact fixed-point cosine; a query probes its 2 nearest
    // cells. At 100 TB the corpus is stored partitioned by cell, the
    // seed table broadcasts, and a query reads 2 partitions — the same
    // pruning story as LSH buckets but with data-adaptive regions.
    // (Real IVF trains centroids with k-means; deterministic seed
    // vectors keep the structure engine-portable for the oracle while
    // exercising the identical plan shape.) ----
    "q53_ann_ivf" -> { (s, d) =>
      val vecs = persistedVecs(s, d)
      val (result, ranked) = ivfTopK(vecs)
      materialized(result, ranked, vecs).orderBy("q_id", "rk")
    },

    // ---- recall report: each approximate method's top-k (restricted to
    // the brute-force query set q_id < 5) scored against q50's exact
    // ground truth — the evaluation harness every ANN deployment runs
    // before trusting an index. Output: method, n_hits, recall.
    // ONE vector table build feeds all four method pipelines, and the
    // truth set + each method output are materialized once (round 2
    // rebuilt the vector table and all four searches from the raw scan
    // inside a single query plan). ----
    "q54_ann_recall" -> { (s, d) =>
      import s.implicits._
      val vecs = persistedVecs(s, d)
      val truth = warmed(bruteTopK(vecs).select("q_id", "vec_id"))
      val (ivf, ranked) = ivfTopK(vecs)
      val methodOut = Seq(
        "q51_ann_lsh" -> lshTopK(vecs),
        "q52_ann_multiprobe" -> multiprobeTopK(vecs),
        "q53_ann_ivf" -> ivf)
      val methods = methodOut.map(_._1)
      val hits = methodOut.map { case (m, out) =>
          out.filter(col("q_id") < 5)
            .select(lit(m).as("method"), col("q_id"), col("vec_id"))
        }.reduce(_ union _)
        .join(truth, Seq("q_id", "vec_id"))
        .groupBy("method").agg(count(lit(1)).as("n_hits"))
      val denom = truth.agg(count(lit(1)).cast("double").as("n_truth"))
      val result = methods.toDF("method")
        .join(hits, Seq("method"), "left")
        .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
        .crossJoin(denom)
        .withColumn("recall", col("n_hits").cast("double") / col("n_truth"))
        .select("method", "n_hits", "recall")
      materialized(result, truth, ranked, vecs).orderBy("method")
    },

    // ---- multi-probe LSH: also search the 6 Hamming-1 neighbor buckets.
    // Single-probe recall is poor when vectors are near-orthogonal (each
    // hyperplane bit is close to a coin flip for moderate cosines);
    // probing the adjacent buckets trades 7x candidate volume for recall —
    // still bucket-pruned, never all-pairs. ----
    "q52_ann_multiprobe" -> { (s, d) =>
      val vecs = persistedVecs(s, d)
      materialized(multiprobeTopK(vecs), vecs).orderBy("q_id", "rk")
    }
  )

  // ---------- oracles ----------

  /** DuckDB: the 6 sign projections as correlated subqueries over inlined
    * coefficient lists. */
  private[operators] def signSqls(qcol: String): Seq[String] =
    (0 until nPlanes).map { h =>
      val lst = planes(h).mkString("[", ",", "]")
      s"""(SELECT SUM($qcol[g.i] * ($lst)[g.i])
         | FROM UNNEST(generate_series(1, $dim)) AS g(i))""".stripMargin
    }

  private[operators] def bucketSql(qcol: String): String =
    signSqls(qcol).zipWithIndex
      .map { case (sq, h) => s"(CASE WHEN $sq >= 0 THEN ${1 << h} ELSE 0 END)" }
      .mkString(" + ")

  private[operators] def vecsCte: String =
    s"""vecs AS (SELECT vec_id, ${quantizeSql("embedding")} AS q FROM embeddings),
       |scored AS (
       |  SELECT vec_id, q,
       |         sqrt(${dotQSql("v.q", "v.q", dim)}) AS norm,
       |         ${bucketSql("v.q")} AS bucket
       |  FROM vecs v)""".stripMargin

  override def oracle: Map[String, String] =
    baseOracle + ("q54_ann_recall" -> recallOracle)

  /** q54's oracle composes the other four oracles as parenthesized
    * subqueries (nested WITH scopes) — the recall arithmetic itself is
    * trivial; the point is both engines score the SAME method outputs.
    */
  private def recallOracle: String = {
    def sub(name: String) = s"(${baseOracle(name)})"
    s"""WITH truth AS (SELECT q_id, vec_id FROM ${sub("q50_ann_brute")} t),
       |cand AS (
       |  SELECT 'q51_ann_lsh' AS method, q_id, vec_id FROM ${sub("q51_ann_lsh")} a WHERE q_id < 5
       |  UNION ALL SELECT 'q52_ann_multiprobe', q_id, vec_id FROM ${sub("q52_ann_multiprobe")} b WHERE q_id < 5
       |  UNION ALL SELECT 'q53_ann_ivf', q_id, vec_id FROM ${sub("q53_ann_ivf")} c WHERE q_id < 5),
       |hits AS (SELECT method, CAST(count(*) AS BIGINT) AS n_hits
       |         FROM cand JOIN truth USING (q_id, vec_id) GROUP BY method),
       |methods(method) AS (VALUES ('q51_ann_lsh'), ('q52_ann_multiprobe'), ('q53_ann_ivf')),
       |denom AS (SELECT CAST(count(*) AS DOUBLE) AS n_truth FROM truth)
       |SELECT m.method, COALESCE(h.n_hits, 0) AS n_hits,
       |       CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / d.n_truth AS recall
       |FROM methods m LEFT JOIN hits h ON h.method = m.method, denom d
       |ORDER BY m.method""".stripMargin
  }

  private def baseOracle: Map[String, String] = Map(
    "q53_ann_ivf" -> {
      val dotVS = dotQSql("v.q", "s.sq", dim)
      val dotPC = dotQSql("p.qq", "c.q", dim)
      s"""WITH $vecsCte,
         |seeds AS (SELECT vec_id AS seed_id, q AS sq, norm AS snorm
         |          FROM scored WHERE vec_id < 8),
         |assigned AS (
         |  SELECT v.vec_id, v.q, v.norm, s.seed_id,
         |         $dotVS / (v.norm * s.snorm) AS cos_seed
         |  FROM scored v CROSS JOIN seeds s),
         |ranked AS (
         |  SELECT vec_id, q, norm, seed_id, cos_seed,
         |         row_number() OVER (PARTITION BY vec_id
         |                            ORDER BY cos_seed DESC, seed_id) AS arn
         |  FROM assigned),
         |cells AS (SELECT vec_id, q, norm, seed_id AS cell FROM ranked WHERE arn = 1),
         |probes AS (SELECT vec_id AS q_id, q AS qq, norm AS qnorm, seed_id AS probe_cell
         |           FROM ranked WHERE vec_id < 20 AND arn <= 2),
         |cand AS (
         |  SELECT p.q_id, c.vec_id, c.cell,
         |         $dotPC / (p.qnorm * c.norm) AS cosine
         |  FROM probes p JOIN cells c
         |    ON c.cell = p.probe_cell AND c.vec_id <> p.q_id),
         |out AS (
         |  SELECT q_id, vec_id, cell, cosine,
         |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS INT) AS rk
         |  FROM cand)
         |SELECT q_id, rk, vec_id, cell, cosine FROM out
         |WHERE rk <= $topK
         |ORDER BY q_id, rk""".stripMargin
    },

    "q50_ann_brute" ->
      s"""WITH $vecsCte,
         |pairs AS (
         |  SELECT qv.vec_id AS q_id, cv.vec_id AS vec_id,
         |         ${dotQSql("qv.q", "cv.q", dim)} / (qv.norm * cv.norm) AS cosine
         |  FROM scored qv JOIN scored cv ON cv.vec_id <> qv.vec_id
         |  WHERE qv.vec_id < 5),
         |ranked AS (
         |  SELECT q_id, vec_id, cosine,
         |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS INT) AS rk
         |  FROM pairs)
         |SELECT q_id, rk, vec_id, cosine FROM ranked
         |WHERE rk <= $topK
         |ORDER BY q_id, rk""".stripMargin,

    "q51_ann_lsh" ->
      s"""WITH $vecsCte,
         |pairs AS (
         |  SELECT qv.vec_id AS q_id, cv.vec_id AS vec_id, cv.bucket AS bucket,
         |         ${dotQSql("qv.q", "cv.q", dim)} / (qv.norm * cv.norm) AS cosine
         |  FROM scored qv JOIN scored cv
         |    ON cv.bucket = qv.bucket AND cv.vec_id <> qv.vec_id
         |  WHERE qv.vec_id < 20),
         |ranked AS (
         |  SELECT q_id, vec_id, bucket, cosine,
         |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS INT) AS rk
         |  FROM pairs)
         |SELECT q_id, rk, vec_id, bucket, cosine FROM ranked
         |WHERE rk <= $topK
         |ORDER BY q_id, rk""".stripMargin,

    "q52_ann_multiprobe" -> {
      val flips = (0 +: (0 until nPlanes).map(1 << _)).mkString("[", ",", "]")
      s"""WITH $vecsCte,
         |probes AS (
         |  SELECT qv.vec_id AS q_id, qv.q AS qq, qv.norm AS qnorm,
         |         CAST(xor(qv.bucket, f.flip) AS INT) AS probe_bucket
         |  FROM scored qv, UNNEST($flips) AS f(flip)
         |  WHERE qv.vec_id < 20),
         |pairs AS (
         |  SELECT p.q_id, cv.vec_id,
         |         ${dotQSql("p.qq", "cv.q", dim)} / (p.qnorm * cv.norm) AS cosine
         |  FROM probes p JOIN scored cv
         |    ON cv.bucket = p.probe_bucket AND cv.vec_id <> p.q_id),
         |ranked AS (
         |  SELECT q_id, vec_id, cosine,
         |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS INT) AS rk
         |  FROM pairs)
         |SELECT q_id, rk, vec_id, cosine FROM ranked
         |WHERE rk <= $topK
         |ORDER BY q_id, rk""".stripMargin
    }
  )
}
