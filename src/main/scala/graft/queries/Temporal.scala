package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.TemporalJoinOps

/** Temporal join queries (engine capability beyond the reference's
  * equi-join-only surface): backward as-of join and point-in-interval
  * range join, both oracle-checked against independent DuckDB
  * formulations (native ASOF JOIN / plain non-equi join).
  */
object Temporal {
  private val dec2 = DecimalType(18, 2)
  private def ev(s: SparkSession, dir: String) = Tables.load(s, dir, "events")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // As-of: each purchase attaches the user's most recent earlier
    // (or simultaneous) non-purchase event. One shuffle on user_id;
    // no per-pair candidate set (see TemporalJoinOps.asOfJoin).
    "q58_asof_join" -> ((s, dir) => {
      val e = ev(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val signals = e.filter(col("event_type") =!= "purchase")
        .select("event_id", "user_id", "ts", "event_type", "value")
      TemporalJoinOps.asOfJoin(purchases, signals, Seq("user_id"),
          leftTime = "ts", rightTime = "ts",
          payload = Seq("event_type", "value"), tieBreak = Some("event_id"))
        .select(col("event_id"), col("user_id").cast("long").as("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          col("asof_event_type").as("prior_type"),
          round(col("asof_value").cast("double"), 2).as("prior_value"),
          (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("gap_us"))
        .orderBy("user_id", "event_id")
    }),

    // Range join: "error burst" windows (first error of each hour +45min)
    // vs all events — intervals share no key with the points and may
    // overlap across hour boundaries, the shape Spark would otherwise
    // plan as a nested-loop join. 15-minute buckets keep per-interval
    // replication at 4-5 rows.
    "q59_interval_attribution" -> ((s, dir) => {
      val e = ev(s, dir)
      val intervals = e.filter(col("event_type") === "error")
        .groupBy(date_trunc("hour", col("ts")).as("iv_hour"))
        .agg(min(col("ts")).as("iv_start"))
        .withColumn("iv_end", col("iv_start") + expr("INTERVAL 45 MINUTES"))
      val points = e.select(col("ts").as("ev_ts"), col("user_id"), col("value"))
      TemporalJoinOps.pointInIntervalJoin(points, intervals,
          pointTs = "ev_ts", startTs = "iv_start", endTs = "iv_end",
          bucketSeconds = 900)
        .groupBy("iv_hour")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          round(sum(col("value").cast(dec2)).cast(dec2).cast("double"), 2).as("total_value"))
        .select(date_format(col("iv_hour"), "yyyy-MM-dd HH:mm:ss").as("window_h"),
          col("n_events"), col("n_users"), col("total_value"))
        .orderBy("window_h")
    }),
  )

  val oracles: Map[String, String] = Map(

    // Independent algorithm: DuckDB's native ASOF JOIN (binary-search
    // merge), vs the engine's union+window. `>=` is inclusive on both.
    "q58_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |    FROM events WHERE event_type = 'purchase'),
        |  o AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
        |    FROM events WHERE event_type <> 'purchase')
        |SELECT p.event_id, CAST(p.user_id AS BIGINT) AS user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  o.event_type AS prior_type,
        |  ROUND(CAST(o.value AS DOUBLE), 2) AS prior_value,
        |  CAST(epoch_us(p.ts) - epoch_us(o.ts) AS BIGINT) AS gap_us
        |FROM p ASOF LEFT JOIN o ON p.user_id = o.user_id AND p.ts >= o.ts
        |ORDER BY user_id, event_id""".stripMargin,

    // Independent algorithm: plain non-equi range join (DuckDB plans an
    // interval join natively), vs the engine's bucketed equi-join.
    "q59_interval_attribution" ->
      """WITH iv AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS iv_hour,
        |    MIN(CAST(ts AS TIMESTAMP)) AS iv_start
        |  FROM events WHERE event_type = 'error' GROUP BY 1),
        |  intervals AS (SELECT iv_hour, iv_start,
        |    iv_start + INTERVAL '45 minutes' AS iv_end FROM iv)
        |SELECT strftime(i.iv_hour, '%Y-%m-%d %H:%M:%S') AS window_h,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
        |  ROUND(CAST(CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE), 2) AS total_value
        |FROM events e JOIN intervals i
        |  ON CAST(e.ts AS TIMESTAMP) >= i.iv_start AND CAST(e.ts AS TIMESTAMP) <= i.iv_end
        |GROUP BY 1 ORDER BY window_h""".stripMargin,
  )
}
