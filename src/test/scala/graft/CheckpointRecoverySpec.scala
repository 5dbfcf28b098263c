package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables

/** Fault-tolerance fidelity: the reference re-executes failed tasks via
  * 5 s leases (SURVEY §3); Spark's equivalent for streaming jobs is the
  * checkpoint — a restarted query resumes from persisted offsets + state
  * and stays exactly-once. This spec stops a stateful dedup stream after
  * half the input, delivers the rest (with cross-batch duplicates!) to a
  * RESTARTED query on the same checkpoint, and asserts the file sink
  * holds the exact batch-distinct result with no re-emissions.
  */
class CheckpointRecoverySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  private lazy val rawSchema =
    graft.core.Tables.eventsRawNanos(spark, dir).schema

  test("restarted dedup stream resumes from checkpoint exactly-once") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val base = Files.createTempDirectory("graft_ckpt")
    val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(inDir))

    val ev = Tables.eventsRawNanos(spark, dir)
    // two halves with OVERLAPPING (user_id, day) pairs across them —
    // the restarted query must drop the cross-half duplicates from
    // recovered state, not from scratch
    ev.filter(col("event_id") % 2 === 0).coalesce(1).write.parquet(s"$base/a")
    ev.filter(col("event_id") % 2 === 1).coalesce(1).write.parquet(s"$base/b")
    def deliver(part: String): Unit =
      Files.list(Paths.get(s"$base/$part")).forEach { p =>
        if (p.toString.endsWith(".parquet"))
          Files.copy(p, Paths.get(s"$inDir/$part.parquet"))
      }

    def runOnce(): Unit = {
      val deduped = graft.core.Tables.normalizeEventTs(
          spark.readStream.schema(rawSchema).parquet(inDir))
        .withColumn("day", date_trunc("day", col("ts")))
        .select("user_id", "day")
        .dropDuplicates("user_id", "day")
      val q = deduped.writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }

    deliver("a")
    runOnce() // first incarnation: half the input
    deliver("b")
    runOnce() // "recovered" incarnation: same checkpoint, rest of input

    val sink = spark.read.parquet(outDir)
    val expect = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    assert(sink.count() == expect.count(), "sink must hold each (user, day) exactly once")
    assert(sink.exceptAll(expect).isEmpty && expect.exceptAll(sink).isEmpty)
  }
}
