package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PipelinePack
import graft.operators.PipelinePack.CheckpointMode

/** The BSP loops (connected components, PageRank) default to
  * executor-local round checkpoints — fast, but lossy under executor
  * failure on a real cluster. CheckpointMode.Reliable is the production
  * form: each round is parked in a durable directory. This spec runs
  * both loops in reliable mode and asserts (a) results are identical to
  * local mode, (b) round state actually landed in the reliable dir.
  */
class ReliableCheckpointSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // a 3-chain, a 2-chain, a self-contained pair and an isolated-ish tail:
  // multi-round convergence (diameter > 1) so >1 round checkpoints
  private def edges = {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L), (21L, 22L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("v", "u")
  }

  test("connectedComponents: reliable mode matches local mode and writes round state") {
    val dir = Files.createTempDirectory("graft_reliable_cc").toString
    val local = PipelinePack.connectedComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val reliable = PipelinePack.connectedComponents(edges, CheckpointMode.Reliable(dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reliable == local)
    assert(reliable.nonEmpty && reliable.forall { case (n, l) => l <= n })
    val written = Files.walk(java.nio.file.Paths.get(dir))
      .filter(Files.isRegularFile(_)).count()
    assert(written > 0, s"no reliable checkpoint files under $dir")
  }

  test("pageRank: reliable mode matches local mode bit-for-bit") {
    val dir = Files.createTempDirectory("graft_reliable_pr").toString
    val local = PipelinePack.pageRank(edges, rounds = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val reliable = PipelinePack.pageRank(edges, rounds = 5, CheckpointMode.Reliable(dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reliable == local)
  }
}
