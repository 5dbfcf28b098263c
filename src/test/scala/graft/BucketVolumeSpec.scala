package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SimilarityPack

/** The hyperplane-LSH bucket space is parameterized by corpus size
  * (round 3 hard-coded 6 bits — a N²/64 self-join at scale): b =
  * clamp(ceilLog2(N) - 3, 4, 24), so EXPECTED bucket occupancy N/2^b is
  * bounded by 8 for every corpus below the 2^24-bucket cap. This spec
  * pins the derivation and checks observed occupancy on real test data.
  */
class BucketVolumeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = SparkTestSession.sfDir

  test("bucket bits derivation: expected occupancy <= 8 below the cap") {
    assert(SimilarityPack.bucketBitsFor(1) == 4)
    assert(SimilarityPack.bucketBitsFor(500) == 6)
    assert(SimilarityPack.bucketBitsFor(2000) == 8)
    assert(SimilarityPack.bucketBitsFor(1000000) == 17)
    assert(SimilarityPack.bucketBitsFor(1000000000L) == SimilarityPack.bMax)
    // below the cap the expected occupancy N / 2^b is <= 8 by construction
    for (n <- Seq(100L, 1000L, 50000L, 1000000L, 100000000L)) {
      val b = SimilarityPack.bucketBitsFor(n)
      if (b < SimilarityPack.bMax)
        assert(n.toDouble / (1L << b) <= 8.0, s"n=$n b=$b")
    }
    // and b never shrinks as the corpus grows
    val bs = Seq(10L, 100L, 1000L, 10000L, 100000L).map(SimilarityPack.bucketBitsFor)
    assert(bs == bs.sorted)
  }

  test("IVF cells grow with sqrt(N); probe width tracks the cell count") {
    assert(SimilarityPack.ivfCellsFor(500) == 32)
    assert(SimilarityPack.ivfCellsFor(2000) == 64)
    assert(SimilarityPack.ivfCellsFor(1000000) == 1024)
    assert(SimilarityPack.ivfCellsFor(1000000000L) == 32768)
    // cells ∝ √N within a factor of 2 on either side
    for (n <- Seq(1000L, 100000L, 10000000L)) {
      val k = SimilarityPack.ivfCellsFor(n)
      val r = k / math.sqrt(n.toDouble)
      assert(r >= 0.5 && r <= 2.5, s"n=$n k=$k ratio=$r")
    }
    assert(SimilarityPack.ivfProbesFor(32) == 16)
    assert(SimilarityPack.ivfProbesFor(2) == 2)
  }

  test("observed bucket occupancy on test data is bounded in every table") {
    val vecs = SimilarityPack.annIndex(spark, sfDir)
    val n = vecs.count()
    val b = SimilarityPack.bucketBits(spark, sfDir)
    val expected = n.toDouble / (1L << b)
    for (t <- 0 until SimilarityPack.nTables) {
      val occ = vecs.groupBy(col(s"bucket_$t")).count()
        .agg(max("count").as("mx"), avg("count").as("av")).collect()(0)
      assert(occ.getDouble(1) <= 8 * expected + 8,
        s"table $t: avg occupancy ${occ.getDouble(1)} vs expected $expected")
      // hyperplane buckets skew with data correlation; the bound proves
      // no bucket degenerates toward the all-pairs regime
      assert(occ.getLong(0) <= n / 4,
        s"table $t: max occupancy ${occ.getLong(0)} of $n rows")
    }
  }

  test("ANN index artifact is partitioned by bucket_0 and probes prune partitions") {
    val vecs = SimilarityPack.annIndex(spark, sfDir)
    val probe = vecs.filter(col("bucket_0") === 3)
    val scan = probe.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("bucket_0"),
      s"probe scan is not partition-pruned:\n$scan")
    // the pruned scan must read strictly fewer files than the full table
    def filesRead(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles
      }.sum
    assert(filesRead(probe) < filesRead(vecs))
    assert(probe.count() > 0)
  }
}
