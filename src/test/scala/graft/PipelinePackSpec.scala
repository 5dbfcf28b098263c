package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DedupPack, PipelinePack}
// (edge set fetched via the registered q43 query — ngramPairs itself is
// package-private to graft.operators)

/** Semantic invariants of the pipeline-policy operators (q46/q47/q65)
  * that the hash-gate alone wouldn't explain: retention keeps exactly one
  * "best" doc per near-dup edge, cluster labels are consistent along
  * edges, and the quality gate's conjunction is sound.
  */
class PipelinePackSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = SparkTestSession.sfDir

  private lazy val pairs =
    DedupPack.queries("q43_dedup_ngram")(spark, sfDir).select("doc_i", "doc_j").collect()
      .map(r => (r.getLong(0), r.getLong(1)))

  test("q46: both endpoints of an edge are never both kept") {
    val kept = PipelinePack.queries("q46_dedup_retention")(spark, sfDir)
      .filter(col("kept")).select("doc_id").collect().map(_.getLong(0)).toSet
    val bothKept = pairs.filter { case (i, j) => kept(i) && kept(j) }
    assert(bothKept.isEmpty, s"edges with both endpoints kept: ${bothKept.take(5).toSeq}")
  }

  test("q46: every doc without a near-dup partner is kept") {
    val inGraph = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val dropped = PipelinePack.queries("q46_dedup_retention")(spark, sfDir)
      .filter(!col("kept")).select("doc_id").collect().map(_.getLong(0))
    assert(dropped.forall(inGraph), "dropped a doc that has no near-dup edge")
  }

  test("q47: adjacent docs share a cluster label") {
    val labels = PipelinePack.queries("q47_dedup_clusters")(spark, sfDir)
      .select("doc_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // fixpoint connected components: every direct edge must agree,
    // whatever the component diameter
    val disagree = pairs.filter { case (i, j) => labels(i) != labels(j) }
    assert(disagree.isEmpty, s"edges across clusters: ${disagree.take(5).toSeq}")
  }

  test("connectedComponents converges on chains far longer than 3 hops") {
    import spark.implicits._
    // one 50-hop path (nodes 100..150), one 4-cycle, one isolated self-pair:
    // the round-2 fixed-3-round unroll split the path into 4+ clusters;
    // the fixpoint loop must label the whole path with its min id
    val path = (100L until 150L).map(i => (i, i + 1))
    val cycle = Seq((200L, 201L), (201L, 202L), (202L, 203L), (203L, 200L))
    val edges = (path ++ cycle).toDF("v", "u")
    val sym = edges.union(edges.select($"u", $"v")).toDF("v", "u")
    val labels = PipelinePack.connectedComponents(sym)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((100L to 150L).forall(labels(_) == 100L),
      "50-hop chain not labeled by its minimum node")
    assert((200L to 203L).forall(labels(_) == 200L), "cycle mislabeled")
    assert(labels.size == 55)
  }

  test("q47: cluster label is the component's minimum doc_id") {
    val rows = PipelinePack.queries("q47_dedup_clusters")(spark, sfDir)
      .select("doc_id", "cluster").collect().map(r => (r.getLong(0), r.getLong(1)))
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (label, members) =>
      assert(members.map(_._1).min == label,
        s"cluster $label does not equal its min member id")
    }
  }

  test("q65: pass_all == conjunction of the three gates") {
    val bad = PipelinePack.queries("q65_quality_gate")(spark, sfDir)
      .filter(col("pass_all") =!=
        (col("pass_min_len") && col("pass_max_len") && col("pass_ttr")))
      .count()
    assert(bad == 0)
  }
}
