package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.functions.Exprs._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Event-table operators: time-bucketed rollups, gap-based
  * sessionization, as-of (latest-prior-event) joins. These are the
  * batch twins of the streaming module (graft.streaming) — same
  * semantics, same column names, so a pipeline can switch between
  * readStream and read without query changes.
  */
object EventQueries extends QueryModule {

  private val ev1 = Q(
    "q_ev1_hourly_rollup",
    "tumbling-hour rollup by event_type with exact sums",
    (s, d) => {
      val e = Tables.events(s, d)
      e.groupBy(date_trunc("HOUR", col("ts")).as("hour"), col("event_type"))
        .agg(cnt.as("n"),
          round(sum(dec6(col("value"))), 4).cast(DoubleType).as("sum_value"),
          countDistinct(col("user_id")).cast(LongType).as("n_users"))
        .orderBy(col("hour"), col("event_type"))
    },
    Some("""
      SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
             CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value,
             count(DISTINCT user_id) AS n_users
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  // Gap-based sessionization (30-min gap) via lag + cumulative sum.
  // Gap compare in integer microseconds on both sides — a seconds-level
  // truncation would classify boundary gaps differently across engines.
  private val ev2 = Q(
    "q_ev2_sessionize",
    "sessionization: 30-min-gap sessions via lag + running sum window",
    (s, d) => {
      val e = Tables.events(s, d)
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_sess")).over(cum))
        .groupBy(col("user_id"), col("session_id"))
        .agg(cnt.as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          round(sum(dec6(col("value"))), 4).cast(DoubleType).as("sum_value"))
        .orderBy(col("user_id"), col("session_id"))
    },
    Some("""
      WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sessions AS (
        SELECT user_id, event_id, ts, value,
               CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM flagged)
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
             min(ts) AS session_start, max(ts) AS session_end,
             CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
      FROM sessions GROUP BY 1, 2 ORDER BY 1, 2"""))

  // As-of join: for each purchase, the latest signup at-or-before it
  // (conditional running max — no shuffle beyond the per-user window).
  private val ev3 = Q(
    "q_ev3_asof_last_signup",
    "as-of join: latest prior signup per purchase via conditional running-max window",
    (s, d) => {
      val e = Tables.events(s, d)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("last_signup_ts",
          max(when(col("event_type") === "signup", col("ts"))).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("last_signup_ts"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, user_id, ts, last_signup_ts FROM (
        SELECT event_id, user_id, ts, event_type,
               max(CASE WHEN event_type = 'signup' THEN ts END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_ts
        FROM events)
      WHERE event_type = 'purchase' ORDER BY event_id"""))

  // Bucketized range join (RangeJoin operator): ship dates into 30-day
  // order windows — a PURE range predicate, the case Spark would
  // otherwise plan as a nested-loop/cartesian. The oracle is the naive
  // BETWEEN join; the Spark side must produce identical pairs through
  // the bucket equi-join + refine plan (PlanAuditSpec pins
  // no-cartesian).
  private val rj1 = Q(
    "q_rj1_range_join",
    "bucketized point-in-interval range join: ship dates × 30-day order windows",
    (s, d) => {
      val epoch = to_date(lit("1970-01-01"))
      val points = Tables.lineitem(s, d).filter(col("l_orderkey") < 300)
        .select(col("l_orderkey"), col("l_linenumber"),
          datediff(col("l_shipdate"), epoch).as("t"))
      val intervals = Tables.orders(s, d).filter(col("o_orderkey") < 100)
        .select(col("o_orderkey").as("interval_id"),
          datediff(col("o_orderdate"), epoch).as("win_start"))
        .withColumn("win_end", col("win_start") + 30)
      RangeJoin.pointInInterval(points, "t", intervals, "win_start", "win_end",
          bucketWidth = 30L)
        .select(col("interval_id"), col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("interval_id"), col("l_orderkey"), col("l_linenumber"))
    },
    Some("""
      SELECT o.o_orderkey AS interval_id, l.l_orderkey, l.l_linenumber
      FROM (SELECT o_orderkey, datediff('day', DATE '1970-01-01', o_orderdate) AS s
            FROM orders WHERE o_orderkey < 100) o
      JOIN (SELECT l_orderkey, l_linenumber, datediff('day', DATE '1970-01-01', l_shipdate) AS t
            FROM lineitem WHERE l_orderkey < 300) l
        ON l.t >= o.s AND l.t < o.s + 30
      ORDER BY 1, 2, 3"""))

  // Cohort retention: users cohorted by first-activity week, then for
  // each (cohort, weeks-since) cell the distinct users still active —
  // the classic product-analytics triangle. Scale shape: per-user
  // first-activity and the distinct user-week table are both two-phase
  // aggs keyed by user; their join co-partitions on user_id; the final
  // cell agg is keyed by (cohort, offset) — bounded cells. Cohort
  // sizes (O(#weeks) rows) broadcast back. Week math stays in
  // TIMESTAMP (never raw DATE — engine-portable), offsets in exact
  // integer day arithmetic.
  private val ev4 = Q(
    "q_ev4_retention_cohorts",
    "cohort retention triangle: first-activity-week cohorts x weeks-since, distinct active users",
    (s, d) => {
      val e = Tables.events(s, d)
      val fw = e.groupBy(col("user_id")).agg(min(col("ts")).as("first_ts"))
        .select(col("user_id"), date_trunc("WEEK", col("first_ts")).as("cohort_week"))
      val aw = e.select(col("user_id"), date_trunc("WEEK", col("ts")).as("act_week"))
        .distinct()
      val cs = fw.groupBy(col("cohort_week"))
        .agg(countDistinct(col("user_id")).cast(LongType).as("cohort_size"))
      aw.join(fw, Seq("user_id"))
        .withColumn("week_offset",
          expr("datediff(act_week, cohort_week) div 7").cast(LongType))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).cast(LongType).as("n_active"))
        .join(broadcast(cs), Seq("cohort_week"))
        .select(col("cohort_week"), col("week_offset"), col("n_active"),
          col("cohort_size"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },
    Some("""
      WITH fw AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id),
      aw AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM events),
      cells AS (
        SELECT f.cohort_week,
               CAST(datediff('day', f.cohort_week, a.act_week) // 7 AS BIGINT) AS week_offset,
               count(DISTINCT a.user_id) AS n_active
        FROM aw a JOIN fw f ON f.user_id = a.user_id
        GROUP BY 1, 2),
      cs AS (SELECT cohort_week, count(DISTINCT user_id) AS cohort_size FROM fw GROUP BY 1)
      SELECT c.cohort_week, c.week_offset, c.n_active, s.cohort_size
      FROM cells c JOIN cs s ON s.cohort_week = c.cohort_week
      ORDER BY c.cohort_week, c.week_offset"""))

  // Semi-structured property extraction — the JSON side-channel every
  // event table carries: pull a typed value out of the props document
  // per row (codegen'd path extraction, no UDF) and roll it up by
  // type. Extraction is map-side on the scan; the rollup is one
  // two-phase agg. Nulls (missing key / malformed document) drop out
  // of the aggregates on both engines identically.
  private val ev5 = Q(
    "q_ev5_props_json",
    "JSON property extraction + rollup: props.k as BIGINT per event_type",
    (s, d) => {
      val e = Tables.events(s, d)
      e.select(col("event_type"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .groupBy(col("event_type"))
        .agg(cnt.as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          countDistinct(col("k")).cast(LongType).as("nd_k"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
             max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
             count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS nd_k
      FROM events GROUP BY event_type ORDER BY event_type"""))

  // Daily spine + last-observation-carried-forward — the canonical
  // time-series gap fill (G3's date spine composed with an
  // ignore-nulls window): per user, one row per calendar day between
  // first and last activity, carrying the value of the day's LAST
  // event (ts desc, event_id desc pick — deterministic) forward across
  // silent days. Scale shape: per-day pick is a keyed window with
  // WindowGroupLimit; the spine explode is bounded by the date range;
  // the fill is a per-user window ordered by day (day count per user
  // is bounded by the calendar, not the event volume). Day stays
  // TIMESTAMP on both engines (the fz2 lesson: DuckDB date_trunc
  // materializes DATE at day grain — cast explicitly).
  private val ev6 = Q(
    "q_ev6_locf_gapfill",
    "daily spine per user + last-observation-carried-forward gap fill",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, d).filter(col("user_id") < 20)
      val wDay = Window.partitionBy(col("user_id"), col("day"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val daily = e.withColumn("day", date_trunc("DAY", col("ts")))
        .withColumn("__rn", row_number().over(wDay))
        .filter(col("__rn") === 1)
        .select(col("user_id"), col("day"), col("value").as("day_value"))
      val spine = e.groupBy(col("user_id"))
        .agg(date_trunc("DAY", min(col("ts"))).as("d0"),
          date_trunc("DAY", max(col("ts"))).as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
      val wFill = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("user_id", "day"), "left")
        .withColumn("filled_value",
          last(col("day_value"), ignoreNulls = true).over(wFill))
        .withColumn("had_event", col("day_value").isNotNull.cast(LongType))
        .select(col("user_id"), col("day"), col("filled_value"), col("had_event"))
        .orderBy(col("user_id"), col("day"))
    },
    Some("""
      WITH e AS (SELECT * FROM events WHERE user_id < 20),
      daily AS (
        SELECT user_id, day, value AS day_value FROM (
          SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, value,
                 row_number() OVER (PARTITION BY user_id, CAST(date_trunc('day', ts) AS TIMESTAMP)
                   ORDER BY ts DESC, event_id DESC) AS rn
          FROM e)
        WHERE rn = 1),
      spine AS (
        SELECT user_id,
               unnest(generate_series(CAST(date_trunc('day', mn) AS TIMESTAMP),
                                      CAST(date_trunc('day', mx) AS TIMESTAMP),
                                      INTERVAL 1 DAY)) AS day
        FROM (SELECT user_id, min(ts) AS mn, max(ts) AS mx FROM e GROUP BY user_id))
      SELECT s.user_id, s.day,
             last_value(d.day_value IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
             CAST(CASE WHEN d.day_value IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS had_event
      FROM spine s
      LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
      ORDER BY s.user_id, s.day"""))

  // Gaps-and-islands: per-user runs of CONSECUTIVE activity days (the
  // streak/continuity feature retention models consume; the calendar
  // sibling of ev2's time-gap sessionization). Days are integer epoch
  // day numbers on BOTH sides — `div 86400000000` of the truncated
  // microsecond epoch — so no DATE value ever reaches the gate (the
  // pandas-vs-DuckDB DATE materialization trap) and the gap compare
  // is exact integer arithmetic. Plan: one distinct, one user-keyed
  // window pair (lag + running sum), one two-phase agg — all
  // co-partitioned on user_id.
  private val ev7 = Q(
    "q_ev7_islands",
    "gaps-and-islands: per-user consecutive-day activity runs via lag + running sum",
    (s, d) => {
      val days = Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .select(col("user_id"),
          expr("unix_micros(date_trunc('DAY', ts)) div 86400000000").as("day"))
        .distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      days
        .withColumn("prev", lag(col("day"), 1).over(w))
        .withColumn("new_island",
          when(col("prev").isNull || col("day") - col("prev") > 1L, 1L).otherwise(0L))
        .withColumn("island_id", sum(col("new_island")).over(cum))
        .groupBy(col("user_id"), col("island_id"))
        .agg(min(col("day")).as("start_day"), max(col("day")).as("end_day"),
          cnt.as("n_days"))
        .orderBy(col("user_id"), col("island_id"))
    },
    Some("""
      WITH days AS (
        SELECT DISTINCT user_id,
               epoch_us(CAST(date_trunc('day', ts) AS TIMESTAMP)) // 86400000000 AS day
        FROM events WHERE user_id IS NOT NULL),
      flagged AS (
        SELECT user_id, day,
               CASE WHEN lag(day) OVER w IS NULL OR day - lag(day) OVER w > 1
                    THEN 1 ELSE 0 END AS new_island
        FROM days WINDOW w AS (PARTITION BY user_id ORDER BY day)),
      islands AS (
        SELECT user_id, day,
               CAST(sum(new_island) OVER (PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island_id
        FROM flagged)
      SELECT user_id, island_id, min(day) AS start_day, max(day) AS end_day,
             count(*) AS n_days
      FROM islands GROUP BY 1, 2 ORDER BY 1, 2"""))

  // Native session_window aggregation — Spark's built-in gap-session
  // operator (the one-expression form of ev2's lag + running-sum
  // construction; also the idiomatic streaming session shape). The
  // oracle replays the SEMANTIC definition (ev2's window chain), so
  // the gate pins Spark's native operator to the textbook gap rule
  // cross-engine. Same microsecond-exact 30-min gap; session bounds
  // compare as whole timestamps.
  private val ev8 = Q(
    "q_ev8_session_window",
    "native session_window(30 min) aggregation == the lag/cumsum session definition",
    (s, d) => {
      val e = Tables.events(s, d).filter(col("user_id").isNotNull)
      e.groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(cnt.as("n_events"), min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"))
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start"))
    },
    Some("""
      WITH flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events WHERE user_id IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sessions AS (
        SELECT user_id, ts,
               CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        FROM flagged)
      SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
             count(*) AS n_events
      FROM sessions GROUP BY user_id, sid
      ORDER BY user_id, session_start"""))

  override val all: Seq[Q] = Seq(ev1, ev2, ev3, ev4, ev5, ev6, ev7, ev8, rj1)
}
