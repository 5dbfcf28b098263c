package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q101 (incremental MinHash dedup: delta batch vs the persisted corpus
  * index) must emit EXACTLY the q41 pair set restricted to pairs that
  * involve at least one delta doc — same signatures, same bands, same
  * thresholds, just an index probe instead of a full self-join. If the
  * incremental path dropped a candidate (band routing bug) or double-
  * emitted one (emit-once orientation bug), this equivalence breaks.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = SparkTestSession.sfDir

  test("incremental dedup == full dedup restricted to delta-involving pairs") {
    val full = graft.operators.DedupPack.queries("q41_dedup_minhash")(spark, d)
      .select("doc_i", "doc_j", "est_matches", "n_common", "jaccard")
    val expected = full
      .filter(pmod(col("doc_i"), lit(10)) === 7 || pmod(col("doc_j"), lit(10)) === 7)
      .collect().toSet
    val inc = graft.operators.DedupPack.queries("q101_incremental_dedup")(spark, d)
      .select("doc_i", "doc_j", "est_matches", "n_common", "jaccard")
      .collect().toSet
    assert(inc == expected,
      s"incremental=${inc.size} pairs, expected=${expected.size}")
    assert(inc.nonEmpty, "fixture corpus produced no delta-involving pairs")
  }

  test("both_delta flags exactly the delta-delta pairs") {
    val rows = graft.operators.DedupPack.queries("q101_incremental_dedup")(spark, d)
      .collect()
    rows.foreach { r =>
      val i = r.getAs[Long]("doc_i"); val j = r.getAs[Long]("doc_j")
      assert(r.getAs[Boolean]("both_delta") == (i % 10 == 7 && j % 10 == 7))
      assert(i % 10 == 7 || j % 10 == 7, s"pair ($i,$j) involves no delta doc")
    }
  }

  test("streaming near-dup == incremental dedup's delta-base subset") {
    val batch = graft.operators.DedupPack.queries("q101_incremental_dedup")(spark, d)
      .filter(!col("both_delta"))
      .select("doc_i", "doc_j", "est_matches", "n_common", "jaccard")
      .collect().toSet
    val streamed = graft.streaming.StreamingPack.queries("q139_stream_neardup")(spark, d)
      .select("doc_i", "doc_j", "est_matches", "n_common", "jaccard")
      .collect().toSet
    assert(streamed == batch,
      s"streamed=${streamed.size} pairs, batch delta-base=${batch.size}")
    assert(streamed.nonEmpty, "fixture corpus produced no delta-base pairs")
  }
}
