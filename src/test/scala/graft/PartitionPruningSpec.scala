package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables

/** Partition layout = the pre-filter: writing the corpus partitioned by a
  * query-time predicate column (here `lang`) lets a filtered scan touch
  * only the matching directories. At 100 TB this is the difference between
  * reading one language's shard and reading the world. Asserts the
  * physical plan shows the predicate as a PartitionFilter (not a
  * post-scan Filter) and that results match an unpartitioned read.
  */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  test("lang-partitioned corpus scan prunes partitions") {
    val out = Files.createTempDirectory("graft_part").toString
    val docs = Tables.documents(spark, dir)
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)

    val scan = spark.read.parquet(out).filter(col("lang") === "en")
    val plan = scan.queryExecution.executedPlan.toString

    assert(plan.contains("PartitionFilters"), s"no PartitionFilters in plan:\n${plan.take(1500)}")
    assert(plan.replaceAll("\\s+", " ").matches(".*PartitionFilters: \\[[^\\]]*lang[^\\]]*\\].*"),
      s"lang predicate not pushed to partition pruning:\n${plan.take(1500)}")

    val expected = docs.filter(col("lang") === "en").count()
    assert(scan.count() == expected)

    // control: the same predicate on the unpartitioned layout is a data
    // filter, proving the pruning above came from the layout
    val flat = spark.read.parquet(s"$dir/documents.parquet").filter(col("lang") === "en")
    assert(flat.count() == expected)
  }
}
