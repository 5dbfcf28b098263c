package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Pins the DSv2 `graft-mem` sink's write contract: partition-parallel
  * writers surface rows only at commit, append accumulates across
  * writes, read-back goes through a V2 BatchScan, and an unknown table
  * fails loudly rather than returning empty. */
class GraftMemSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def fresh(): String = s"spec_${System.nanoTime()}"

  test("write -> read roundtrip preserves the exact row multiset across partitions") {
    import spark.implicits._
    val tbl = fresh()
    val df = (1L to 100L).map(i => (i, s"v$i", i * 2.0)).toDF("id", "s", "x")
      .repartition(7)
    df.write.format("graft-mem").option("table", tbl).mode("append").save()
    val back = spark.read.format("graft-mem").option("table", tbl).load()
    val scans = back.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty)
    assert(back.schema.fieldNames.toSeq === Seq("id", "s", "x"))
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1).toSeq === (1L to 100L).map(i => (i, s"v$i", i * 2.0)))
  }

  test("append mode accumulates; a second write doubles the rows") {
    import spark.implicits._
    val tbl = fresh()
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    df.write.format("graft-mem").option("table", tbl).mode("append").save()
    df.write.format("graft-mem").option("table", tbl).mode("append").save()
    assert(spark.read.format("graft-mem").option("table", tbl).load().count() === 4L)
  }

  test("reading an unknown table fails loudly") {
    val e = intercept[Exception] {
      spark.read.format("graft-mem").option("table", "never_written").load()
    }
    assert(e.getMessage.contains("unknown table"))
  }

  test("time travel: each commit snapshots; versionAsOf reads the pinned state") {
    import spark.implicits._
    val tbl = fresh()
    Seq((1L, "a")).toDF("id", "s")
      .write.format("graft-mem").option("table", tbl).mode("append").save()
    Seq((2L, "b")).toDF("id", "s")
      .write.format("graft-mem").option("table", tbl).mode("append").save()
    assert(graft.sources.GraftMemStore.currentVersion(tbl) === 2)
    def readAt(v: Int) = spark.read.format("graft-mem")
      .option("table", tbl).option("versionAsOf", v.toString).load()
    assert(readAt(1).collect().map(_.getLong(0)).toSeq === Seq(1L))
    assert(readAt(2).count() === 2L)
    // SQL VERSION AS OF through the catalog route
    spark.conf.set("spark.sql.catalog.graftmem",
      classOf[graft.sources.GraftMemCatalog].getName)
    assert(spark.sql(s"SELECT * FROM graftmem.$tbl VERSION AS OF 1").count() === 1L)
  }

  test("time travel: a pinned snapshot refuses writes and survives later commits") {
    import spark.implicits._
    val tbl = fresh()
    Seq((1L, "a")).toDF("id", "s")
      .write.format("graft-mem").option("table", tbl).mode("append").save()
    val pinned = spark.read.format("graft-mem")
      .option("table", tbl).option("versionAsOf", "1").load()
    Seq((2L, "b")).toDF("id", "s")
      .write.format("graft-mem").option("table", tbl).mode("append").save()
    // the pin still reads version 1 even after the table advanced
    assert(pinned.count() === 1L)
    val e = intercept[Exception] {
      Seq((3L, "c")).toDF("id", "s").write.format("graft-mem")
        .option("table", tbl).option("versionAsOf", "1").mode("append").save()
    }
    assert(e.getMessage.contains("read-only snapshot"))
  }

  test("expireSnapshots drops old versions loudly but keeps retained ones") {
    import graft.sources.GraftMemStore
    import spark.implicits._
    val tbl = fresh()
    (1 to 3).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "s")
        .write.format("graft-mem").option("table", tbl).mode("append").save()
    }
    assert(GraftMemStore.retainedVersions(tbl) === Seq(1, 2, 3))
    assert(GraftMemStore.expireSnapshots(tbl, keepLast = 1) === 2)
    assert(GraftMemStore.retainedVersions(tbl) === Seq(3))
    val e = intercept[Exception] {
      spark.read.format("graft-mem").option("table", tbl)
        .option("versionAsOf", "1").load().collect()
    }
    def causes(t: Throwable): Iterator[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("no snapshot"))))
    assert(spark.read.format("graft-mem").option("table", tbl)
      .option("versionAsOf", "3").load().count() === 3L)
  }

  test("CDC diff is a multiset diff: duplicate-row multiplicity changes surface") {
    import spark.implicits._
    val tbl = fresh()
    // v1: two identical rows; v2: three of them — the diff must be ONE insert
    Seq((1L, "a"), (1L, "a")).toDF("id", "s")
      .write.format("graft-mem").option("table", tbl).mode("append").save()
    Seq((1L, "a")).toDF("id", "s")
      .write.format("graft-mem").option("table", tbl).mode("append").save()
    val ch = spark.read.format("graft-mem").option("table", tbl)
      .option("changesFrom", "1").option("changesTo", "2").load().collect()
    assert(ch.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ===
      Seq((1L, "a", "insert")))
  }

  test("CDC surfaces an upsert as delete-of-old + insert-of-new") {
    import spark.implicits._
    val tbl = fresh()
    Seq((1L, "old"), (2L, "keep")).toDF("id", "s")
      .write.format("graft-mem").option("table", tbl).mode("append").save()
    spark.conf.set("spark.sql.catalog.graftmem",
      classOf[graft.sources.GraftMemCatalog].getName)
    Seq((1L, "new")).toDF("id", "s")
      .writeTo(s"graftmem.$tbl").overwrite(org.apache.spark.sql.functions.col("id") === 1L)
    val ch = spark.read.format("graft-mem").option("table", tbl)
      .option("changesFrom", "1").option("changesTo", "2").load()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._3)
    assert(ch.toSeq === Seq((1L, "old", "delete"), (1L, "new", "insert")))
  }

  test("CDC refuses tables with non-atomic columns loudly") {
    import spark.implicits._
    val tbl = fresh()
    Seq((1L, Seq(1, 2))).toDF("id", "xs")
      .write.format("graft-mem").option("table", tbl).mode("append").save()
    val e = intercept[Exception] {
      spark.read.format("graft-mem").option("table", tbl)
        .option("changesFrom", "1").option("changesTo", "1").load().collect()
    }
    def causes(t: Throwable): Iterator[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("value-comparable atomic"))))
  }

  test("CDC over an expired endpoint fails like an expired time-travel pin") {
    import spark.implicits._
    val tbl = fresh()
    (1 to 3).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "s")
        .write.format("graft-mem").option("table", tbl).mode("append").save()
    }
    graft.sources.GraftMemStore.expireSnapshots(tbl, keepLast = 1)
    val e = intercept[Exception] {
      spark.read.format("graft-mem").option("table", tbl)
        .option("changesFrom", "1").option("changesTo", "3").load().collect()
    }
    def causes(t: Throwable): Iterator[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("no snapshot"))))
  }

  test("schema evolution: old rows read NULL for the added column; refusals are loud") {
    import org.apache.spark.sql.types.{LongType, StructField}
    import spark.implicits._
    val tbl = fresh()
    Seq((1L, "a")).toDF("id", "s")
      .write.format("graft-mem").option("table", tbl).mode("append").save()
    graft.sources.GraftMemStore.addColumn(tbl, StructField("x", LongType))
    val back = spark.read.format("graft-mem").option("table", tbl).load()
    assert(back.schema.fieldNames.toSeq === Seq("id", "s", "x"))
    assert(back.collect().map(r => (r.getLong(0), r.isNullAt(2))).toSeq ===
      Seq((1L, true)))
    // post-evolution writes populate it; pre-evolution snapshot reads NULL
    Seq((2L, "b", 7L)).toDF("id", "s", "x")
      .write.format("graft-mem").option("table", tbl).mode("append").save()
    val v1 = spark.read.format("graft-mem").option("table", tbl)
      .option("versionAsOf", "1").load()
    assert(v1.collect().map(r => (r.getLong(0), r.isNullAt(2))).toSeq ===
      Seq((1L, true)))
    // non-nullable and duplicate adds refuse
    val e1 = intercept[IllegalArgumentException] {
      graft.sources.GraftMemStore.addColumn(tbl,
        StructField("y", LongType, nullable = false))
    }
    assert(e1.getMessage.contains("must be nullable"))
    val e2 = intercept[IllegalArgumentException] {
      graft.sources.GraftMemStore.addColumn(tbl, StructField("x", LongType))
    }
    assert(e2.getMessage.contains("already has a column"))
  }

  test("streaming CDC tail resumes from its checkpoint: only new commits deliver") {
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val tbl = fresh()
    val outTbl = s"${tbl}_out"
    val ckpt = java.nio.file.Files.createTempDirectory("cdc_restart").toString
    def commitRow(i: Long): Unit =
      Seq((i, s"v$i")).toDF("id", "s")
        .write.format("graft-mem").option("table", tbl).mode("append").save()
    def drain(): Unit = {
      val q = spark.readStream.format("graft-mem").option("table", tbl)
        .option("changesFrom", "1").load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          b.withColumn("batch_id", lit(id))
            .write.format("graft-mem").option("table", outTbl).mode("append").save()
          ()
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      q.awaitTermination()
    }
    commitRow(1); commitRow(2)
    drain() // delivers versions 1->2 as batch 0 (nothing before v1)
    val afterFirst = spark.read.format("graft-mem").option("table", outTbl).load()
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
    assert(afterFirst.toSeq.sorted === Seq((2L, "insert", 0L)))
    commitRow(3)
    drain() // restart from the checkpoint: ONLY version 3's change
    val afterSecond = spark.read.format("graft-mem").option("table", outTbl).load()
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
    assert(afterSecond.toSeq.sorted === Seq((2L, "insert", 0L), (3L, "insert", 1L)))
    // pinned restart discipline: batch ids CONTINUE (1), they don't reset
    assert(afterSecond.map(_._3).max === 1L)
  }

  test("TIMESTAMP AS OF is refused with a version-addressing message") {
    import spark.implicits._
    val tbl = fresh()
    Seq((1L, "a")).toDF("id", "s")
      .write.format("graft-mem").option("table", tbl).mode("append").save()
    spark.conf.set("spark.sql.catalog.graftmem",
      classOf[graft.sources.GraftMemCatalog].getName)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graftmem.$tbl TIMESTAMP AS OF '2026-01-01'")
        .collect()
    }
    def causes(t: Throwable): Iterator[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
    assert(causes(e).exists(c => Option(c.getMessage)
      .exists(_.contains("versioned by commit number"))))
  }
}
