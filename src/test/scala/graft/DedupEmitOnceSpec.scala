package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DedupPack

/** The banded-LSH joins (q41/q42) generate candidates with an emit-once
  * predicate (band 1 fires only where band 0 didn't) instead of a
  * distinct() shuffle — so the output must already be duplicate-free.
  */
class DedupEmitOnceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = SparkTestSession.sfDir

  for (q <- Seq("q41_dedup_minhash", "q42_dedup_simhash")) {
    test(s"$q emits every pair exactly once") {
      val df = DedupPack.queries(q)(spark, sfDir)
      val dupes = df.groupBy("doc_i", "doc_j").count().filter(col("count") > 1).count()
      assert(dupes == 0, s"$q produced duplicate pairs")
    }
  }

  test("q129 banding precision/recall is internally consistent") {
    val r = DedupPack.queries("q129_minhash_pr")(spark, sfDir)
      .select("n_truth", "n_cand", "n_cand_true", "precision_ppm", "recall_ppm")
      .head()
    val (nTruth, nCand, nCandTrue) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nCandTrue <= nTruth && nCandTrue <= nCand)
    assert(r.getLong(3) == nCandTrue * 1000000L / nCand)
    assert(r.getLong(4) == nCandTrue * 1000000L / nTruth)
    // q41's output is the banding's true pairs minus any the est_matches
    // prefilter drops — never more than n_cand_true
    val q41 = DedupPack.queries("q41_dedup_minhash")(spark, sfDir).count()
    assert(q41 <= nCandTrue)
    spark.catalog.clearCache()
  }
}
