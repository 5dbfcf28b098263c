package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins q106's contract directly: the STREAMED Count-Min matrix (state
  * store across micro-batches) must yield row-for-row the same probe
  * output as the batch q104 — the linear-merge property end-to-end
  * through Structured Streaming, not just through CountMinSpec's raw
  * buffer model check. (The dual-engine gate pins both against DuckDB
  * separately; this pins them against each other in one JVM.)
  */
class StreamBatchSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("streamed sketch probe == batch sketch probe, row for row") {
    val dir = SparkTestSession.sfDir
    val batch = SparkEntry.queries("q104_countmin_freq")(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    spark.catalog.clearCache()
    val streamed = SparkEntry.queries("q106_stream_countmin")(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    spark.catalog.clearCache()
    assert(batch.nonEmpty)
    assert(streamed === batch)
  }
}
