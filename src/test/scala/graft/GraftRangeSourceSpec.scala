package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Pins the DSv2 `graft-range` connector's contract: exact row set
  * across slice boundaries (including n not divisible by slices, n <
  * slices, and n = 0), resolution by registered short name through the
  * V2 read path, and column pruning reaching the scan. */
class GraftRangeSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def read(n: Long, slices: Int) =
    spark.read.format("graft-range")
      .option("n", n.toString).option("slices", slices.toString).load()

  test("row set is exactly 0..n-1 with sq and bucket, across uneven slices") {
    val got = read(103, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    assert(got.length === 103)
    assert(got === (0L until 103L).map(i => (i, i * i, (i % 16).toInt)).toArray)
  }

  test("n < slices and n = 0 degenerate cleanly") {
    assert(read(3, 8).collect().map(_.getLong(0)).sorted === Array(0L, 1L, 2L))
    assert(read(0, 4).count() === 0L)
  }

  test("plan goes through BatchScanExec and prunes to the referenced columns") {
    val df = read(50, 4).select("bucket")
    val scans = df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq === Seq("bucket"))
    assert(df.collect().map(_.getInt(0)).sorted === (0L until 50L).map(i => (i % 16).toInt).sorted)
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): graft.sources.GraftRangeScan =
    df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
      .head.scan.asInstanceOf[graft.sources.GraftRangeScan]

  test("id range predicates narrow the generated interval (V2 filter pushdown)") {
    val df = read(1000, 4).filter("id >= 990")
    val sc = scanOf(df)
    assert((sc.lo, sc.hi) === (990L, 1000L))
    assert(df.collect().map(_.getLong(0)).sorted === (990L until 1000L).toArray)

    val eq = read(1000, 4).filter("id = 500")
    assert((scanOf(eq).lo, scanOf(eq).hi) === (500L, 501L))
    assert(eq.collect().map(r => (r.getLong(0), r.getLong(1))) === Array((500L, 250000L)))

    // an unsatisfiable range degenerates to zero partitions, zero rows
    val empty = read(1000, 4).filter("id < 0")
    assert(scanOf(empty).hi <= scanOf(empty).lo || empty.count() === 0L)
    assert(empty.count() === 0L)
  }

  test("non-id predicates stay residual: interval unchanged, results still correct") {
    val df = read(100, 4).filter("bucket = 3")
    val sc = scanOf(df)
    assert((sc.lo, sc.hi) === (0L, 100L))
    assert(df.collect().map(_.getLong(0)).sorted ===
      (0L until 100L).filter(_ % 16 == 3).toArray)
  }

  test("planner sees the requested slice parallelism") {
    val df = read(1000, 7)
    val scans = df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.head.inputRDD.getNumPartitions === 7)
  }

  // ---- aggregate pushdown ----

  private def aggScanOf(df: org.apache.spark.sql.DataFrame): Option[graft.sources.GraftRangeAggScan] =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r.scan
    }.headOption.collect { case a: graft.sources.GraftRangeAggScan => a }

  test("grouped count/min/max/sum push to the connector and merge exactly") {
    import org.apache.spark.sql.functions._
    val df = read(103, 4).groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("id").as("mn"),
        max("id").as("mx"), sum("sq").as("ss"))
    val sc = aggScanOf(df)
    assert(sc.nonEmpty, "aggregation was not pushed")
    assert(sc.get.grouped && sc.get.funcs === Seq("count", "min_id", "max_id", "sum_sq"))
    val got = df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).sortBy(_._1)
    val want = (0L until 103L).groupBy(i => (i % 16).toInt).toSeq.sortBy(_._1)
      .map { case (b, ids) => (b, ids.length.toLong, ids.min, ids.max,
        ids.map(i => i * i).sum) }
    assert(got.toSeq === want)
  }

  test("global (ungrouped) aggregation pushes and matches brute force") {
    import org.apache.spark.sql.functions._
    val df = read(103, 4)
      .agg(count(lit(1)).as("n"), min("id").as("mn"),
        max("id").as("mx"), sum("sq").as("ss"))
    assert(aggScanOf(df).exists(s => !s.grouped))
    val r = df.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      (103L, 0L, 102L, (0L until 103L).map(i => i * i).sum))
  }

  test("unsupported aggregates are declined: plain scan, result still correct") {
    import org.apache.spark.sql.functions._
    // sum(id) is not in the accepted set; the connector must decline and
    // Spark falls back to scanning base rows + its own aggregation
    val df = read(103, 4).groupBy("bucket").agg(sum("id").as("si"))
    assert(aggScanOf(df).isEmpty)
    val got = df.collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val want = (0L until 103L).groupBy(i => (i % 16).toInt).toSeq.sortBy(_._1)
      .map { case (b, ids) => (b, ids.sum) }
    assert(got.toSeq === want)
  }

  // ---- limit / top-N pushdown ----

  test("LIMIT pushes to the connector and truncates the generated interval") {
    val df = read(1000000, 8).limit(1000)
    val sc = scanOf(df)
    assert(sc.pushedLimit === Some(1000))
    assert((sc.lo, sc.hi) === (0L, 1000L))
    assert(df.collect().map(_.getLong(0)).sorted === (0L until 1000L).toArray)
  }

  test("ORDER BY id DESC LIMIT k pushes as top-N keeping the LAST k ids") {
    val df = read(1000000, 8).orderBy(org.apache.spark.sql.functions.col("id").desc)
      .limit(100)
    val sc = scanOf(df)
    assert(sc.pushedLimit === Some(100) && sc.pushedTopNDesc === Some(true))
    assert((sc.lo, sc.hi) === (999900L, 1000000L))
    assert(df.collect().map(_.getLong(0)).toSeq ===
      (999999L to 999900L by -1L).toSeq)
  }

  test("ORDER BY id ASC LIMIT k pushes as top-N keeping the FIRST k ids") {
    val df = read(1000000, 8).orderBy("id").limit(10)
    val sc = scanOf(df)
    assert(sc.pushedLimit === Some(10) && sc.pushedTopNDesc === Some(false))
    assert((sc.lo, sc.hi) === (0L, 10L))
    assert(df.collect().map(_.getLong(0)).toSeq === (0L until 10L).toSeq)
  }

  test("top-N on a non-id key declines: full interval, result still correct") {
    val df = read(100, 4).orderBy(org.apache.spark.sql.functions.col("sq").desc)
      .limit(5)
    val sc = scanOf(df)
    assert(sc.pushedTopNDesc.isEmpty)
    assert((sc.lo, sc.hi) === (0L, 100L))
    assert(df.collect().map(_.getLong(0)).toSeq === (99L to 95L by -1L).toSeq)
  }

  test("limit composes with pushed range filters: first k of the interval") {
    val df = read(1000000, 8).filter("id >= 500000").limit(50)
    val sc = scanOf(df)
    assert((sc.lo, sc.hi) === (500000L, 500050L))
    assert(df.collect().map(_.getLong(0)).sorted ===
      (500000L until 500050L).toArray)
  }

  // ---- metadata columns ----

  test("_slice metadata column reports the serving split ordinal") {
    val df = read(100, 4).select(
      org.apache.spark.sql.functions.col("_slice"),
      org.apache.spark.sql.functions.col("id"))
    val got = df.collect().map(r => (r.getLong(1), r.getInt(0))).sortBy(_._1)
    // 100 rows over 4 slices = 25 ids per slice, contiguous
    assert(got.toSeq === (0L until 100L).map(i => (i, (i / 25).toInt)))
    // the metadata column travels the pruned-schema path like any field
    val sc = scanOf(df)
    assert(sc.readSchema().fieldNames.toSet === Set("id", "_slice"))
  }

  test("_slice stays hidden unless referenced: select(*) keeps the data schema") {
    assert(read(10, 2).columns.toSeq === Seq("id", "sq", "bucket"))
  }

  // ---- micro-batch streaming read ----

  test("streaming read delivers the exact row set across multiple micro-batches") {
    import org.apache.spark.sql.functions._
    val src = spark.readStream.format("graft-range")
      .option("n", "103").option("slices", "4").option("batchRows", "40")
      .load()
    val q = src.groupBy("bucket").agg(count(lit(1)).as("n"), sum("id").as("si"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("graft_range_stream_spec").start()
    try q.processAllAvailable() finally q.stop()
    val batches = q.recentProgress.toSeq.map(_.numInputRows).filter(_ > 0)
    assert(batches === Seq(40L, 40L, 23L)) // the offset log's admission slices
    val got = spark.table("graft_range_stream_spec").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val want = (0L until 103L).groupBy(i => (i % 16).toInt).toSeq.sortBy(_._1)
      .map { case (b, ids) => (b, ids.length.toLong, ids.sum) }
    assert(got.toSeq === want)
  }

  test("stream offsets re-seed from checkpointed offsets (restart monotonicity)") {
    import graft.sources.{GraftRangeMicroBatchStream, GraftRangeOffset}
    // simulate a restart: a fresh stream instance is handed the logged
    // offset 80 via deserializeOffset; admission must continue FROM it
    val st = new GraftRangeMicroBatchStream(0L, 103L, 4, 40L)
    assert(st.deserializeOffset("80") === GraftRangeOffset(80L))
    assert(st.latestOffset() === GraftRangeOffset(103L)) // 80+40 clamped to n
    // a second restart signal below the hwm must not move it backwards
    st.deserializeOffset("40")
    assert(st.latestOffset() === GraftRangeOffset(103L))
  }

  test("a pushed id lower bound flows into the stream as the initial offset") {
    import graft.sources.{GraftRangeMicroBatchStream, GraftRangeOffset}
    val st = new GraftRangeMicroBatchStream(60L, 103L, 4, 40L)
    assert(st.initialOffset() === GraftRangeOffset(60L))
    assert(st.latestOffset() === GraftRangeOffset(100L)) // 60+40
    assert(st.latestOffset() === GraftRangeOffset(103L)) // clamped to hi
  }

  // ---- composed clustered-scan capabilities (q468/q471 mechanics) ----

  test("clustered runtime filter keeps all 16 bucket partitions with the " +
      "identical key set while narrowing the generated ids") {
    val scan = new graft.sources.GraftRangeClusteredScan(0L, 1000L,
      graft.sources.GraftRangeSource.schema)
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("id",
        Array[Any](java.lang.Long.valueOf(3L), java.lang.Long.valueOf(19L),
          java.lang.Long.valueOf(35L), java.lang.Long.valueOf(4L),
          java.lang.Long.valueOf(2000L))))) // 2000 outside [0,1000) → dropped
    val parts = scan.planInputPartitions()
    assert(parts.length === 16) // the KeyGrouped contract: no bucket vanishes
    val byBucket = parts.map(_.asInstanceOf[graft.sources.GraftRangeBucketPartition])
      .map(p => p.bucket -> Option(p.ids).map(_.toSeq).getOrElse(Nil)).toMap
    assert(byBucket(3) === Seq(3L, 19L, 35L)) // 3 ≡ 19 ≡ 35 (mod 16)
    assert(byBucket(4) === Seq(4L))
    assert(byBucket(5) === Nil) // surviving-empty bucket still planned
  }

  test("clustered scan only advertises id for runtime filtering while it " +
      "survives pruning") {
    val full = new graft.sources.GraftRangeClusteredScan(0L, 100L,
      graft.sources.GraftRangeSource.schema)
    assert(full.filterAttributes().map(_.describe()).toSeq === Seq("id"))
    val pruned = new graft.sources.GraftRangeClusteredScan(0L, 100L,
      org.apache.spark.sql.types.StructType(
        graft.sources.GraftRangeSource.schema.filter(_.name != "id")))
    assert(pruned.filterAttributes().isEmpty)
  }

  test("clustered agg pushdown (clusterAgg=true) answers GROUP BY bucket in " +
      "closed form and composes with a pushed range filter") {
    val df = spark.read.format("graft-range")
      .option("n", "100000").option("slices", "8")
      .option("clusterByBucket", "true").option("clusterAgg", "true").load()
      .filter("id >= 1000 and id < 91000")
      .groupBy("bucket")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("sq").as("sum_sq"))
    val scan = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan
    }.head
    assert(scan.isInstanceOf[graft.sources.GraftRangeClusteredAggScan])
    val a = scan.asInstanceOf[graft.sources.GraftRangeClusteredAggScan]
    assert((a.lo, a.hi) === (1000L, 91000L))
    val got = df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val want = (1000L until 91000L).groupBy(i => (i % 16).toInt).toSeq.sortBy(_._1)
      .map { case (b, ids) => (b, ids.length.toLong, ids.map(i => i * i).sum) }
    assert(got.toSeq === want)
  }

  test("clustered agg pushdown declines global aggregates (partitioning " +
      "could not survive) and without clusterAgg") {
    def scanFor(clusterAgg: Boolean, grouped: Boolean) = {
      var df = spark.read.format("graft-range")
        .option("n", "1000").option("slices", "4")
        .option("clusterByBucket", "true")
        .option("clusterAgg", clusterAgg.toString).load()
      val agg = if (grouped)
        df.groupBy("bucket").agg(org.apache.spark.sql.functions.sum("sq").as("s"))
      else df.agg(org.apache.spark.sql.functions.sum("sq").as("s"))
      agg.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.scan
      }.head
    }
    assert(!scanFor(clusterAgg = false, grouped = true)
      .isInstanceOf[graft.sources.GraftRangeClusteredAggScan])
    assert(!scanFor(clusterAgg = true, grouped = false)
      .isInstanceOf[graft.sources.GraftRangeClusteredAggScan])
    assert(scanFor(clusterAgg = true, grouped = true)
      .isInstanceOf[graft.sources.GraftRangeClusteredAggScan])
  }

  test("clustered scan reports real statistics (rows and bytes scale with " +
      "the narrowed interval)") {
    val scan = new graft.sources.GraftRangeClusteredScan(100L, 600L,
      graft.sources.GraftRangeSource.schema)
    val st = scan.estimateStatistics()
    assert(st.numRows().getAsLong === 500L)
    assert(st.sizeInBytes().getAsLong === 500L * 24L)
  }
}
