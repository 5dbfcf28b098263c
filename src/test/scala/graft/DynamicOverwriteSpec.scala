package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Idempotent partitioned batch sink — the exactly-once pattern for
  * re-runnable 100 TB pipeline stages: with dynamic partition
  * overwrite, re-writing one day's output replaces ONLY that day's
  * partition (no duplicates on retry, other partitions untouched),
  * where static overwrite mode would wipe the whole table.
  */
class DynamicOverwriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("re-running one day's write replaces exactly that partition") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_dyn_overwrite").toString
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // initial load: three day-partitions
      Seq((1L, "d1", 10.0), (2L, "d1", 20.0), (3L, "d2", 30.0), (4L, "d3", 40.0))
        .toDF("id", "day", "v")
        .write.partitionBy("day").mode("overwrite").parquet(out)
      // the retried stage recomputes day d2 (one changed row) and
      // re-runs its write verbatim — the idempotent-retry shape
      val rerun = Seq((3L, "d2", 99.0)).toDF("id", "day", "v")
      rerun.write.partitionBy("day").mode("overwrite").parquet(out)
      rerun.write.partitionBy("day").mode("overwrite").parquet(out) // retry
      val got = spark.read.parquet(out)
        .select("id", "day", "v").as[(Long, String, Double)]
        .collect().toSet
      assert(got == Set((1L, "d1", 10.0), (2L, "d1", 20.0),
        (3L, "d2", 99.0), (4L, "d3", 40.0)),
        s"dynamic overwrite must replace only day=d2: $got")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }
}
