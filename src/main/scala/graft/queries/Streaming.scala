package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.streaming.StreamOps

/** Streaming-shaped operators run in batch mode over the events table —
  * the same StreamOps builders serve readStream sources (see
  * StreamingSpec); here DuckDB oracles pin the window semantics.
  */
object Streaming {
  private val dec2 = DecimalType(18, 2)
  private def ev(s: SparkSession, dir: String) = Tables.load(s, dir, "events")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Tumbling 1h windows per event type.
    "q36_tumbling_window" -> ((s, dir) => {
      StreamOps.tumblingAgg(ev(s, dir), "ts", "1 hour", Seq("event_type"),
          Seq(count(lit(1)).as("n_events"),
            round(sum(col("value").cast(dec2)).cast(dec2).cast("double"), 2).as("total_value")))
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n_events"), col("total_value"))
        .orderBy("window_start", "event_type")
    }),

    // Sliding 1h windows every 30min (each event lands in 2 windows).
    "q37_sliding_window" -> ((s, dir) => {
      StreamOps.slidingAgg(ev(s, dir), "ts", "1 hour", "30 minutes", Nil,
          Seq(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users")))
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("n_events"), col("n_users"))
        .orderBy("window_start")
    }),

    // Session windows (5-minute gap) per user.
    "q38_session_window" -> ((s, dir) => {
      StreamOps.sessionAgg(ev(s, dir), "ts", "5 minutes", Seq("user_id"),
          Seq(count(lit(1)).as("n_events")))
        .select(col("user_id").cast("long").as("user_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          (unix_micros(col("session_end")) - unix_micros(col("session_start")))
            .as("session_span_us"),
          col("n_events"))
        .orderBy("user_id", "session_start")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q36_tumbling_window" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "q37_sliding_window" ->
      """WITH half AS (SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) AS hb,
        |    user_id FROM events),
        |assigned AS (
        |  SELECT hb AS window_start, user_id FROM half
        |  UNION ALL
        |  SELECT hb - INTERVAL '30 minutes' AS window_start, user_id FROM half)
        |SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM assigned GROUP BY window_start ORDER BY window_start""".stripMargin,

    "q38_session_window" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |flagged AS (SELECT user_id, ts,
        |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL '5 minutes'
        |      OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1 ELSE 0 END AS new_s
        |  FROM e),
        |grp AS (SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT CAST(user_id AS BIGINT) AS user_id,
        |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  epoch_us(MAX(ts)) - epoch_us(MIN(ts)) + 300000000 AS session_span_us,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM grp GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,
  )
}
