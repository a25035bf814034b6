package graft.queries

import graft.Tables
import graft.operators.Temporal
import org.apache.spark.sql.functions._

/** Temporal-join queries: as-of joins (backward + forward) and a binned
  * point-in-interval range join. These extend the reference surface with the
  * time-series operators a training-data/event pipeline needs; the DuckDB
  * oracles use its native ASOF JOIN and inequality-join planners — genuinely
  * independent implementations of the same semantics.
  */
object OpsTemporal extends Suite {

  // -- as-of backward: each view/click event picks up the most recent prior
  //    (inclusive) purchase by the same user. Right side pre-aggregated per
  //    (user_id, ts) to pin the asofJoin uniqueness contract. ---------------
  private val asofBackward: Q = (s, dir) => {
    val t = Tables(s, dir)
    val purchases = t.events
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"), col("value"))
      .groupBy(col("user_id"), col("pts"))
      .agg(max(col("value")).as("purchase_value"))
    val looks = t.events
      .filter(col("event_type").isin("view", "click"))
      .select(col("event_id"), col("user_id"), col("ts"))
    Temporal.asofJoin(looks, purchases, Seq("user_id"), "ts", "pts")
      .filter(col("matched_pts").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("matched_pts").as("purchase_ts"),
        col("matched_purchase_value").as("purchase_value"))
      .orderBy(col("event_id"))
  }
  private val asofBackwardSql =
    """WITH p AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS pts, max(value) AS pv
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |l AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type IN ('view', 'click'))
      |SELECT l.event_id, l.user_id, l.ts, p.pts AS purchase_ts,
      |  p.pv AS purchase_value
      |FROM l ASOF JOIN p ON l.user_id = p.user_id AND l.ts >= p.pts
      |ORDER BY l.event_id""".stripMargin

  // -- as-of forward: each purchase picks up the next click (inclusive) by
  //    the same user, plus the wait in µs. ---------------------------------
  private val asofForward: Q = (s, dir) => {
    val t = Tables(s, dir)
    val clicks = t.events
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"), col("event_id"))
      .groupBy(col("user_id"), col("cts"))
      .agg(min(col("event_id")).as("click_id"))
    val purchases = t.events
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    Temporal.asofJoin(purchases, clicks, Seq("user_id"), "ts", "cts",
        direction = "forward")
      .filter(col("matched_cts").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("matched_cts").as("next_click_ts"),
        (unix_micros(col("matched_cts")) - unix_micros(col("ts")))
          .as("wait_us"),
        col("matched_click_id").as("click_id"))
      .orderBy(col("event_id"))
  }
  private val asofForwardSql =
    """WITH c AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS cts,
      |    min(event_id) AS click_id
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      |l AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'purchase')
      |SELECT l.event_id, l.user_id, l.ts, c.cts AS next_click_ts,
      |  epoch_us(c.cts) - epoch_us(l.ts) AS wait_us, c.click_id
      |FROM l ASOF JOIN c ON l.user_id = c.user_id AND l.ts <= c.cts
      |ORDER BY l.event_id""".stripMargin

  // -- as-of with tolerance: same backward join, but matches farther than
  //    one hour are nulled out (then dropped → inner). The oracle keeps
  //    DuckDB's ASOF match and filters the gap — identical semantics,
  //    since tolerance never changes WHICH row matches, only whether it
  //    survives. -----------------------------------------------------------
  private val usPerHour = 3600000000L
  private val asofTolerance: Q = (s, dir) => {
    val t = Tables(s, dir)
    val purchases = t.events
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"), col("value"))
      .groupBy(col("user_id"), col("pts"))
      .agg(max(col("value")).as("purchase_value"))
    val looks = t.events
      .filter(col("event_type").isin("view", "click"))
      .select(col("event_id"), col("user_id"), col("ts"))
    Temporal.asofJoin(looks, purchases, Seq("user_id"), "ts", "pts",
        toleranceUs = Some(usPerHour))
      .filter(col("matched_pts").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("matched_pts").as("purchase_ts"),
        col("matched_purchase_value").as("purchase_value"))
      .orderBy(col("event_id"))
  }
  private val asofToleranceSql =
    """WITH p AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS pts, max(value) AS pv
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |l AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type IN ('view', 'click'))
      |SELECT l.event_id, l.user_id, l.ts, p.pts AS purchase_ts,
      |  p.pv AS purchase_value
      |FROM l ASOF JOIN p ON l.user_id = p.user_id AND l.ts >= p.pts
      |WHERE epoch_us(l.ts) - epoch_us(p.pts) <= 3600000000
      |ORDER BY l.event_id""".stripMargin

  // -- as-of nearest (the pandas merge_asof third direction): each look
  //    matches the purchase minimizing |Δt|, ties to the backward side.
  //    The oracle composes DuckDB's two native ASOF directions and picks
  //    the nearer — an independent formulation of the same semantics. ----
  private val asofNearest: Q = (s, dir) => {
    val t = Tables(s, dir)
    val purchases = t.events
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"), col("value"))
      .groupBy(col("user_id"), col("pts"))
      .agg(max(col("value")).as("purchase_value"))
    val looks = t.events
      .filter(col("event_type").isin("view", "click"))
      .select(col("event_id"), col("user_id"), col("ts"))
    Temporal.asofJoinNearest(looks, purchases, Seq("user_id"), "ts", "pts")
      .filter(col("matched_pts").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("matched_pts").as("purchase_ts"),
        col("matched_purchase_value").as("purchase_value"))
      .orderBy(col("event_id"))
  }
  private val asofNearestSql =
    """WITH p AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS pts, max(value) AS pv
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |l AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type IN ('view', 'click')),
      |b AS (SELECT l.event_id, l.user_id, l.ts, p.pts AS bts, p.pv AS bv
      |      FROM l ASOF LEFT JOIN p
      |        ON l.user_id = p.user_id AND l.ts >= p.pts),
      |f AS (SELECT l.event_id, p.pts AS fts, p.pv AS fv
      |      FROM l ASOF LEFT JOIN p
      |        ON l.user_id = p.user_id AND l.ts <= p.pts),
      |c AS (SELECT b.event_id, b.user_id, b.ts,
      |    CASE WHEN bts IS NOT NULL AND (fts IS NULL OR
      |        epoch_us(b.ts) - epoch_us(bts)
      |          <= epoch_us(fts) - epoch_us(b.ts))
      |      THEN bts ELSE fts END AS mts,
      |    CASE WHEN bts IS NOT NULL AND (fts IS NULL OR
      |        epoch_us(b.ts) - epoch_us(bts)
      |          <= epoch_us(fts) - epoch_us(b.ts))
      |      THEN bv ELSE fv END AS mv
      |  FROM b JOIN f USING (event_id))
      |SELECT event_id, user_id, ts, mts AS purchase_ts,
      |  mv AS purchase_value
      |FROM c WHERE mts IS NOT NULL ORDER BY event_id""".stripMargin

  // -- range join: shipments falling inside the 14-day window after a
  //    top-price order's date (a pure inequality join — no equi key at
  //    all). Threshold and window are calibrated so the TRUE result stays
  //    ~10⁷ pairs at sf0.1 — the pair count is inherent to the query
  //    semantics (the oracle does identical work), not operator overhead.
  //    binWidth = window keeps buckets-per-interval ≤ 2. l_quantity sums
  //    are integer-valued doubles, so the sum is order-independent and
  //    exact. ---------------------------------------------------------------
  private val usPerDay = 86400000000L
  private val rangeJoin: Q = (s, dir) => {
    val t = Tables(s, dir)
    val bigOrders = t.orders
      .filter(col("o_totalprice") > 490000)
      .select(col("o_orderkey"), col("o_orderdate"))
    val shipments =
      t.lineitem.select(col("l_quantity"), col("l_shipdate"))
    // parquet dates are TIMESTAMP_NTZ; cast to TIMESTAMP for unix_micros
    // (session tz is UTC, so the instant is unchanged)
    val shipUs = unix_micros(col("l_shipdate").cast("timestamp"))
    val orderUs = unix_micros(col("o_orderdate").cast("timestamp"))
    Temporal.rangeJoinBinned(
        shipments, shipUs,
        bigOrders, orderUs, orderUs + lit(14L * usPerDay),
        binWidth = 14L * usPerDay)
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_shipments"),
           sum(col("l_quantity")).as("qty"))
      .orderBy(col("o_orderkey"))
  }
  private val rangeJoinSql =
    """SELECT o.o_orderkey, count(*) AS n_shipments,
      |  sum(l.l_quantity) AS qty
      |FROM orders o JOIN lineitem l
      |  ON l.l_shipdate >= o.o_orderdate
      | AND l.l_shipdate < o.o_orderdate + INTERVAL 14 DAY
      |WHERE o.o_totalprice > 490000
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // -- time-series resampling: forward-fill each user's event value onto a
  //    regular hourly grid with a 6-hour staleness cap — grid generation
  //    (map-side sequence explode, no join) + ONE as-of join; the gap cap
  //    is the asofJoin tolerance. The classic gaps-to-grid downsampling
  //    every metrics/feature pipeline runs. ------------------------------
  private val resample: Q = (s, dir) => {
    val t = Tables(s, dir)
    val evs = t.events.filter(col("user_id") < 10)
      .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("v"))
    val users = t.events.filter(col("user_id") < 10)
      .select(col("user_id")).distinct()
    val grid = users.withColumn("gts", explode(expr(
      "sequence(timestamp'2024-01-01 00:00:00'," +
        " timestamp'2024-01-01 23:00:00', interval 1 hour)")))
    Temporal.asofJoin(grid, evs, Seq("user_id"), "gts", "ts",
        toleranceUs = Some(6L * usPerHour))
      // src_ts emitted as epoch-µs: a NULLABLE timestamp column trips the
      // driver gate's masked ns-vs-µs raw-integer compare (non-null
      // timestamp columns like gts compare fine)
      .select(col("user_id"), col("gts"),
        unix_micros(col("matched_ts")).as("src_us"), col("matched_v").as("v"))
      .orderBy(col("user_id"), col("gts"))
  }
  private val resampleSql =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
      |    max(value) AS v
      |  FROM events WHERE user_id < 10 GROUP BY 1, 2),
      |u AS (SELECT DISTINCT user_id FROM events WHERE user_id < 10),
      |g AS (SELECT user_id,
      |    unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
      |      TIMESTAMP '2024-01-01 23:00:00', INTERVAL 1 HOUR)) AS gts
      |  FROM u)
      |SELECT g.user_id, g.gts,
      |  CASE WHEN epoch_us(g.gts) - epoch_us(e.ts) <= 21600000000
      |       THEN epoch_us(e.ts) END AS src_us,
      |  CASE WHEN epoch_us(g.gts) - epoch_us(e.ts) <= 21600000000
      |       THEN e.v END AS v
      |FROM g ASOF LEFT JOIN e
      |  ON g.user_id = e.user_id AND g.gts >= e.ts
      |ORDER BY g.user_id, g.gts""".stripMargin

  def defs: Map[String, Q] = Map(
    "events_resample" -> resample,
    "op_asof_nearest" -> asofNearest,
    "op_asof_join" -> asofBackward,
    "op_asof_fwd" -> asofForward,
    "op_asof_tolerance" -> asofTolerance,
    "op_range_join" -> rangeJoin)

  def oracle: Map[String, String] = Map(
    "events_resample" -> resampleSql,
    "op_asof_nearest" -> asofNearestSql,
    "op_asof_join" -> asofBackwardSql,
    "op_asof_fwd" -> asofForwardSql,
    "op_asof_tolerance" -> asofToleranceSql,
    "op_range_join" -> rangeJoinSql)
}
