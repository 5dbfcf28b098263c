package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew-handling pattern: two-phase salted aggregation must equal the
  * direct aggregation. At 100 TB a hot key (one user generating 10% of
  * all events) makes the single-shuffle groupBy straggle on one
  * partition; salting fans the hot key across `nSalts` partial groups
  * and re-aggregates the partials — same result, bounded partition size.
  * (AQE's skew handling covers joins; aggregation skew still wants this.)
  */
class SkewSaltingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def saltedSum(df: DataFrame, key: String, value: String, nSalts: Int): DataFrame =
    df.withColumn("salt", pmod(crc32(col(key).cast("string")) + monotonically_increasing_id(), lit(nSalts)))
      .groupBy(col(key), col("salt"))
      .agg(sum(col(value).cast("decimal(18,2)")).as("partial"), count(lit(1)).as("pn"))
      .groupBy(col(key))
      .agg(sum(col("partial")).cast("double").as("total"), sum(col("pn")).as("n"))

  test("salted two-phase aggregation == direct aggregation under skew") {
    import spark.implicits._
    // synthetic skew: key 0 holds half of all rows
    val rows = (1 to 20000).map { i =>
      val k = if (i % 2 == 0) 0L else (i % 97).toLong
      (k, (i % 1000) / 100.0)
    }
    val df = rows.toDF("k", "v").repartition(8)
    val direct = df.groupBy("k")
      .agg(sum(col("v").cast("decimal(18,2)")).cast("double").as("total"),
           count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = saltedSum(df, "k", "v", 16)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == direct)
  }
}
