package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PipelinePack

/** q130's bin assignment must conserve the manifest: every simulated
  * file lands in exactly one bin (floor(start_offset / target)), so the
  * plan's file/doc/byte totals equal the corpus's — and no bin can start
  * past the end of the byte stream.
  */
class CompactionPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = SparkTestSession.sfDir

  test("compaction plan conserves files, docs, and bytes") {
    val plan = PipelinePack.queries("q130_compaction_plan")(spark, sfDir)
    val t = plan.agg(
      sum("n_files").as("f"), sum("n_docs").as("d"), sum("bin_bytes").as("b"),
      max("bin").as("maxbin")).head()
    val docs = graft.core.Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    val nBytes = docs.agg(sum("n_chars")).head().getLong(0)
    val nFiles = docs.select(col("source"), expr("doc_id div 50")).distinct().count()
    assert(t.getLong(0) == nFiles)
    assert(t.getLong(1) == nDocs)
    assert(t.getLong(2) == nBytes)
    // the last bin's index cannot exceed the stream length in targets
    assert(t.getLong(3) <= nBytes / 16384L)
    spark.catalog.clearCache()
  }
}
