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

  // ---- q56's salted band join under a viral burst ----

  test("salted range join: a viral burst stays bounded per key and matches brute force") {
    import spark.implicits._
    // viral burst: 600 events inside ONE 10 s bucket (every 10 ms), plus
    // a sparse background stream before and after
    val base = 1700000000000000L // us; bucket-aligned era
    val burst = (0 until 600).map(i => (1000L + i, "burst", base + 20000000L + i * 10000L))
    val sparse = (0 until 50).map(i => (5000L + i, "bg", base + i * 7000000L))
    val events = (burst ++ sparse).toDF("event_id", "event_type", "us").repartition(8)

    val salted = graft.operators.EventsPack.saltedRangePairs(events)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // brute-force theta join — the ground truth the banding+salting must equal
    val aa = events.select(col("event_id").as("a_id"), col("us").as("a_us"))
    val bb = events.select(col("event_id").as("b_id"), col("us").as("b_us"))
    val brute = aa.join(bb,
        col("b_us") >= col("a_us") && col("b_us") <= col("a_us") + 10000000L &&
          (col("b_us") > col("a_us") || col("a_id") < col("b_id")))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted == brute)
    assert(salted.size > 600 * 599 / 2, "the burst must actually produce quadratic pairs")

    // the bound BY CONSTRUCTION: the build side's biggest (bucket, salt)
    // key group is the burst size / salt width, not the burst size
    val S = graft.operators.EventsPack.rangeSalt
    val maxGroup = events
      .groupBy(expr("us div 10000000"), col("event_id") % S).count()
      .agg(max("count")).collect()(0).getLong(0)
    val maxBucket = events
      .groupBy(expr("us div 10000000")).count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxGroup <= (maxBucket + S - 1) / S,
      s"salt failed to split the hot bucket: $maxGroup vs bucket $maxBucket")
  }
}
