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
}
