package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DedupPack, PipelinePack}

/** q141 peels a FIXED 4 rounds (the q122 unrolled-oracle pattern); these
  * checks keep that honest: every surviving node has in-core degree >=
  * k, and a 5th peel round removes nothing on the gate corpus — 4
  * rounds IS the fixpoint there.
  */
class KCoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = SparkTestSession.sfDir

  test("k-core invariants: degree >= k and 4 rounds reach fixpoint") {
    val core = PipelinePack.queries("q141_kcore")(spark, d)
    val rows = core.collect()
    assert(rows.nonEmpty, "fixture corpus has an empty 2-core")
    rows.foreach(r => assert(r.getAs[Long]("deg_in_core") >= 2L))
    // a 5th round is a no-op: every node's in-core degree already >= k,
    // so the next keep-filter retains all of them
    val nodes = rows.map(_.getAs[Long]("doc_id")).toSet
    val pairs = DedupPack.queries("q43_dedup_ngram")(spark, d)
      .select("doc_i", "doc_j").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // independent in-memory model: peel to TRUE fixpoint, compare sets
    var alive = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    var changed = true
    while (changed) {
      val deg = pairs.filter(p => alive(p._1) && alive(p._2))
        .flatMap(p => Seq(p._1, p._2)).groupBy(identity).map { case (k2, v) => (k2, v.length) }
      val next = alive.filter(v => deg.getOrElse(v, 0) >= 2)
      changed = next != alive
      alive = next
    }
    assert(nodes == alive,
      s"4-round peel (${nodes.size} nodes) != true fixpoint (${alive.size} nodes)")
    spark.catalog.clearCache()
  }
}
