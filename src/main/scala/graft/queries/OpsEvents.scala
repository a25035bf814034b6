package graft.queries

import graft.Tables
import graft.functions.{Functions => Fx}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the events table — the batch formulations of
  * the patterns a stream pipeline needs (sessionization, funnels, tumbling
  * windows). The reference is batch-only (SURVEY §1: no streaming), so these
  * run as ordinary window/agg plans; partitioning is by user/bucket, which
  * is exactly the state key a streaming port would use.
  */
object OpsEvents extends Suite {

  // -- sessionization: 30-minute inactivity gap splits sessions -------------
  private val sessionize: Q = (s, dir) => {
    val t = Tables(s, dir)
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000000
    val withGap = t.events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
    withGap.groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
           min(col("ts")).as("session_start"),
           max(col("ts")).as("session_end"),
           round(sum(col("value")), 2).as("session_value"))
      .orderBy(col("user_id"), col("session_seq"))
  }
  private val sessionizeSql =
    """WITH g AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
      |    lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |  FROM events),
      |m AS (
      |  SELECT *, CASE WHEN prev_us IS NULL
      |    OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END
      |    AS new_session FROM g),
      |x AS (
      |  SELECT *, sum(new_session) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      |  FROM m)
      |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
      |  count(*) AS n_events,
      |  min(ts) AS session_start, max(ts) AS session_end,
      |  round(sum(value), 2) AS session_value
      |FROM x GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  // -- transition matrix: per-user next-event pairs → counts + row-
  //    normalized probabilities (the Markov-chain view of event flows) ----
  private val transitions: Q = (s, dir) => {
    val t = Tables(s, dir)
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wf = Window.partitionBy(col("from_type"))
    t.events
      .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("to_type").isNotNull)
      .select(col("event_type").as("from_type"), col("to_type"))
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        round(col("n") * lit(1.0) / sum(col("n")).over(wf), 6))
      .orderBy(col("from_type"), col("to_type"))
  }
  private val transitionsSql =
    """WITH s AS (SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |c AS (SELECT event_type AS from_type, to_type, count(*) AS n FROM s
      |      WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  round(n * 1.0 / sum(n) OVER (PARTITION BY from_type), 6) AS p
      |FROM c ORDER BY from_type, to_type""".stripMargin

  // -- funnel: users who did view → click → purchase in order ---------------
  private val funnel: Q = (s, dir) => {
    val t = Tables(s, dir)
    val firsts = t.events
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts")))
          .as("t_purchase"))
    firsts.agg(
      count(lit(1)).as("n_users"),
      sum(when(col("t_view").isNotNull, 1L).otherwise(0L)).as("n_view"),
      sum(when(col("t_view") < col("t_click"), 1L).otherwise(0L))
        .as("n_view_click"),
      sum(when(col("t_view") < col("t_click") &&
               col("t_click") < col("t_purchase"), 1L).otherwise(0L))
        .as("n_full_funnel"))
  }
  private val funnelSql =
    """WITH f AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END)
      |      AS t_view,
      |    min(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END)
      |      AS t_click,
      |    min(CASE WHEN event_type = 'purchase'
      |        THEN CAST(ts AS TIMESTAMP) END) AS t_purchase
      |  FROM events GROUP BY user_id)
      |SELECT count(*) AS n_users,
      |  CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_view,
      |  CAST(sum(CASE WHEN t_view < t_click THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_view_click,
      |  CAST(sum(CASE WHEN t_view < t_click AND t_click < t_purchase
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
      |FROM f""".stripMargin

  // -- tumbling 1-hour windows via date_bin ---------------------------------
  private val tumbling: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.events
      .withColumn("bucket", Fx.date_bin("1 HOUR", col("ts"),
        lit("2024-01-01 00:00:00").cast("timestamp")))
      .groupBy(col("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
      .orderBy(col("bucket"), col("event_type"))
  }
  private val tumblingSql =
    """SELECT make_timestamp(
      |    ((epoch_us(CAST(ts AS TIMESTAMP))
      |      - epoch_us(TIMESTAMP '2024-01-01 00:00:00')) // 3600000000)
      |    * 3600000000
      |    + epoch_us(TIMESTAMP '2024-01-01 00:00:00')) AS bucket,
      |  event_type, count(*) AS n, round(sum(value), 2) AS v
      |FROM events
      |GROUP BY bucket, event_type
      |ORDER BY bucket, event_type""".stripMargin

  // -- windowed event dedup (log-dedup shape): keep the FIRST event per
  //    (user, type) within each 5-minute bin — collapses client retries /
  //    at-least-once delivery dups. Dedup.exact over the bin key: the
  //    GroupedTopK k=1 single-pass path, no per-user window sort. ---------
  private val dedupWindow: Q = (s, dir) => {
    val t = Tables(s, dir)
    val binned = t.events
      .withColumn("bin", Fx.date_bin("5 MINUTES", col("ts"),
        lit("2024-01-01 00:00:00").cast("timestamp")))
    graft.operators.Dedup.exact(binned,
        Seq("user_id", "event_type", "bin"), "event_id")
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy(col("event_id"))
  }
  private val dedupWindowSql =
    """SELECT min(event_id) AS event_id, user_id, event_type
      |FROM (SELECT event_id, user_id, event_type,
      |  (epoch_us(CAST(ts AS TIMESTAMP))
      |   - epoch_us(TIMESTAMP '2024-01-01 00:00:00')) // 300000000 AS bin
      |  FROM events)
      |GROUP BY user_id, event_type, bin
      |ORDER BY event_id""".stripMargin

  // -- cohort retention: users bucketed by first-seen day × activity day.
  //    The first-seen side scales with |users|, so its join strategy is
  //    AQE's choice (broadcast at small SF, shuffle at scale); countDistinct
  //    is partial-aggregated per (cohort, activity) pair. -------------------
  private val cohort: Q = (s, dir) => {
    val t = Tables(s, dir)
    val firstSeen = t.events.groupBy(col("user_id"))
      .agg(date_trunc("day", min(col("ts"))).as("cohort_day"))
    t.events
      .join(firstSeen, Seq("user_id"))
      .groupBy(col("cohort_day"),
        date_trunc("day", col("ts")).as("activity_day"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .orderBy(col("cohort_day"), col("activity_day"))
  }
  private val cohortSql =
    """WITH fs AS (
      |  SELECT user_id,
      |    date_trunc('day', min(CAST(ts AS TIMESTAMP))) AS cohort_day
      |  FROM events GROUP BY user_id)
      |SELECT CAST(fs.cohort_day AS TIMESTAMP) AS cohort_day,
      |  CAST(date_trunc('day', CAST(e.ts AS TIMESTAMP)) AS TIMESTAMP)
      |    AS activity_day,
      |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
      |FROM events e JOIN fs ON e.user_id = fs.user_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- semi-structured props: JSON metadata column → typed extraction →
  //    aggregate. get_json_object is codegen'd path extraction (no UDF,
  //    no full from_json materialization when one key is needed); the
  //    oracle uses DuckDB's independent JSON parser. ----------------------
  private val jsonProps: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("k")).as("k_sum"),
           min(col("k")).as("k_min"),
           max(col("k")).as("k_max"))
      .orderBy(col("event_type"))
  }
  private val jsonPropsSql =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
      |    AS BIGINT) AS k_sum,
      |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
      |FROM events
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  def defs: Map[String, Q] = Map(
    "events_json_props" -> jsonProps,
    "events_sessionize" -> sessionize,
    "events_funnel" -> funnel,
    "events_transitions" -> transitions,
    "events_tumbling" -> tumbling,
    "events_dedup_window" -> dedupWindow,
    "events_cohort" -> cohort)

  def oracle: Map[String, String] = Map(
    "events_json_props" -> jsonPropsSql,
    "events_sessionize" -> sessionizeSql,
    "events_funnel" -> funnelSql,
    "events_transitions" -> transitionsSql,
    "events_tumbling" -> tumblingSql,
    "events_dedup_window" -> dedupWindowSql,
    "events_cohort" -> cohortSql)
}
