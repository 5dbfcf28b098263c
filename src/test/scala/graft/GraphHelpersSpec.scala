package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The q118/q328 graph substrate on a corpus with a KNOWN co-occurrence
  * graph: a 3-clique (one triangle) plus a disconnected edge. Pins the
  * edge construction rules (adjacent-bigram, a < b ordering, ≥ 3 docs),
  * the compact-forward triangle count, and the q328 clustering
  * coefficient arithmetic against hand-computed values.
  */
class GraphHelpersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def writeDocs(texts: Seq[String]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_graph_spec").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("cooccurEdges builds the expected ordered edge list") {
    // each adjacent pair appears in exactly 3 documents (the support
    // threshold); 'dd ee' is an isolated edge with no closing wedge
    val d = writeDocs(Seq.fill(3)("aa bb") ++ Seq.fill(3)("bb cc") ++
      Seq.fill(3)("aa cc") ++ Seq.fill(3)("dd ee"))
    val edges = graft.operators.PipelinePack.cooccurEdges(spark, d)
      .orderBy("a", "b").collect().map(r => (r.getString(0), r.getString(1)))
    assert(edges.toSeq == Seq(("aa", "bb"), ("aa", "cc"), ("bb", "cc"), ("dd", "ee")))
  }

  test("perWordTriangles and the clustering coefficient close the 3-clique") {
    val d = writeDocs(Seq.fill(3)("aa bb") ++ Seq.fill(3)("bb cc") ++
      Seq.fill(3)("aa cc") ++ Seq.fill(3)("dd ee"))
    val edges = graft.operators.PipelinePack.cooccurEdges(spark, d)
    val tri = graft.operators.PipelinePack.perWordTriangles(edges)
      .orderBy("w").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(tri.toSeq == Seq(("aa", 1L), ("bb", 1L), ("cc", 1L)))

    val cc = graft.operators.PipelinePack.queries("q328_clustering_coeff")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // clique members: degree 2, 1 triangle, cc = 2·1/(2·1) = 1.0;
    // the isolated edge's endpoints (degree 1) are filtered out
    assert(cc.toSeq == Seq(
      ("aa", 2L, 1L, 1000000L), ("bb", 2L, 1L, 1000000L), ("cc", 2L, 1L, 1000000L)))
  }

  test("a support-2 pair stays out of the edge list") {
    val d = writeDocs(Seq.fill(3)("aa bb") ++ Seq.fill(2)("bb cc"))
    val edges = graft.operators.PipelinePack.cooccurEdges(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(edges.toSeq == Seq(("aa", "bb")))
  }
}
