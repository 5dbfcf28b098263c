package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{QueryPack, Tables}

/** Time-series analytics over the static `events` table: tumbling and
  * sliding windows, sessionization. The reference is strictly batch
  * (SURVEY.md §1.2), so these are batch window/groupBy queries; the
  * streaming-native versions of the same computations live in
  * [[graft.streaming.StreamingPack]].
  *
  * Scale design (100 TB): all three queries shuffle once, partitioned by
  * their natural key (bucket+type / user). Sessionization is the classic
  * lag-gap-cumsum idiom — a single `partitionBy(user_id)` window, no
  * self-join, no driver-side state; skewed users would be handled by AQE
  * or a session-chunking salt at real scale.
  */
object EventsPack extends QueryPack {

  private def dec2(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- tumbling 1-hour windows per event type ----
    "q30_tumbling_window" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(dec2(col("value"))).cast("double").as("total_value"))
        .orderBy("hour_start", "event_type")
    },

    // ---- sliding windows: 1 hour long, every 30 minutes ----
    "q31_sliding_window" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w_start"), col("event_type"), col("n"))
        .orderBy("w_start", "event_type")
    },

    // ---- sessionization: 30-minute inactivity gap via lag + cumsum ----
    "q32_sessionize" -> { (s, d) =>
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_us").isNull ||
               unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L).otherwise(0L))
        .withColumn("session_seq", sum(col("new_session")).over(byUser))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"),
             min(col("ts")).as("session_start"),
             max(col("ts")).as("session_end"),
             (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("duration_us"))
        .orderBy("user_id", "session_seq")
    }
  )

  override def oracle: Map[String, String] = Map(
    "q30_tumbling_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start, event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour_start, event_type""".stripMargin,

    "q31_sliding_window" ->
      """WITH assigned AS (
        |  SELECT unnest([time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)),
        |                 time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) - INTERVAL '30 minutes'])
        |           AS w_start,
        |         event_type
        |  FROM events)
        |SELECT w_start, event_type, CAST(count(*) AS BIGINT) AS n
        |FROM assigned
        |GROUP BY w_start, event_type
        |ORDER BY w_start, event_type""".stripMargin,

    "q32_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |         lag(epoch_us(CAST(ts AS TIMESTAMP)))
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |sessions AS (
        |  SELECT user_id, ts, us,
        |         SUM(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM flagged)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       min(ts) AS session_start, max(ts) AS session_end,
        |       CAST(max(us) - min(us) AS BIGINT) AS duration_us
        |FROM sessions
        |GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin
  )
}
