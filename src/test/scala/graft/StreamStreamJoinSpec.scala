package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables

/** Stream-stream interval join: signups joined to purchases by the same
  * user within 7 days, both sides watermarked — the state-bounded
  * streaming join shape (watermark + time bound let Spark evict join
  * state; without them stream-stream state grows forever). The streamed
  * result must equal the batch interval join.
  */
class StreamStreamJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  private lazy val rawSchema =
    graft.core.Tables.eventsRawNanos(spark, dir).schema

  test("watermarked stream-stream interval join == batch interval join") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def stream(eventType: String, alias: String) =
      graft.core.Tables.normalizeEventTs(
        spark.readStream.schema(rawSchema)
          .option("pathGlobFilter", "events.parquet").parquet(dir))
        .filter(col("event_type") === eventType)
        .select(col("user_id").as(s"${alias}_user"),
                col("event_id").as(s"${alias}_id"),
                col("ts").as(s"${alias}_ts"))
        .withWatermark(s"${alias}_ts", "1 hour")

    val joined = stream("signup", "s").join(stream("purchase", "p"),
      expr("""s_user = p_user AND
              p_ts >= s_ts AND p_ts <= s_ts + INTERVAL 7 DAYS"""))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("graft_ss_join").start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("graft_ss_join")
      .select("s_id", "p_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val ev = Tables.events(spark, dir)
    val s = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("su"), col("event_id").as("s_id"), col("ts").as("sts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("p_id"), col("ts").as("pts"))
    val batch = s.join(p,
        expr("su = pu AND pts >= sts AND pts <= sts + INTERVAL 7 DAYS"))
      .select("s_id", "p_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(streamed == batch,
      s"streamed=${streamed.size} batch=${batch.size} " +
        s"onlyStreamed=${(streamed -- batch).take(3)} onlyBatch=${(batch -- streamed).take(3)}")
    assert(batch.nonEmpty)
  }
}
