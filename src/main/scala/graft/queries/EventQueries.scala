package graft.queries

import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operator coverage computed in batch (SURVEY.md §2.10,
  * §7.4): JSON extraction, tumbling/sliding/session time windows, and
  * an as-of join. The same transforms run under Structured Streaming
  * (see graft.streaming); batch keeps them DuckDB-checkable.
  */
object EventQueries {
  import Exact._

  val all: Seq[QueryDef] = Seq(
    // JSON scalar extraction from the events.props string column.
    QueryDef(
      "q24_json_extract",
      (s, d) =>
        events(s, d)
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k_value"))
          .orderBy("event_id"),
      Some("""SELECT event_id,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
             |FROM events ORDER BY event_id""".stripMargin)),

    // Tumbling 1-hour window aggregation. Spark `window()` is
    // epoch-aligned, so the start equals date_trunc('hour', ts).
    QueryDef(
      "q25_tumbling_window",
      (s, d) =>
        events(s, d)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
          .select(col("window.start").as("window_start"), col("event_type"),
            col("n_events"), col("sum_value"))
          .orderBy("window_start", "event_type"),
      Some(s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type,
              |  COUNT(*) AS n_events, ${sqlDsum("value")} AS sum_value
              |FROM events
              |GROUP BY date_trunc('hour', ts), event_type
              |ORDER BY window_start, event_type""".stripMargin)),

    // Sliding window: 1 hour wide, sliding every 30 minutes — each
    // event lands in exactly two windows (starts at bucket and
    // bucket-30min, epoch-aligned).
    QueryDef(
      "q26_sliding_window",
      (s, d) =>
        events(s, d)
          .groupBy(window(col("ts"), "1 hour", "30 minutes"))
          .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
          .select(col("window.start").as("window_start"),
            col("n_events"), col("sum_value"))
          .orderBy("window_start"),
      Some(s"""WITH b AS (
              |  SELECT CAST(time_bucket(INTERVAL '30 minutes', ts) AS TIMESTAMP) AS b0, value
              |  FROM events
              |), w AS (
              |  SELECT unnest([b0, b0 - INTERVAL '30 minutes']) AS window_start,
              |         value
              |  FROM b
              |)
              |SELECT window_start, COUNT(*) AS n_events,
              |  ${sqlDsum("value")} AS sum_value
              |FROM w GROUP BY window_start ORDER BY window_start""".stripMargin)),

    // Session window per user with a 5-minute inactivity gap. Oracle is
    // the classic gaps-and-islands rewrite: a new session starts when
    // ts >= prev_ts + gap (Spark merges [ts, ts+gap) intervals that
    // overlap).
    QueryDef(
      "q27_session_window",
      (s, d) =>
        events(s, d)
          .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
          .select(col("session_window.start").as("session_start"),
            col("session_window.end").as("session_end"),
            col("user_id"), col("n_events"), col("sum_value"))
          .orderBy("user_id", "session_start"),
      Some(s"""WITH flagged AS (
              |  SELECT user_id, ts, value, event_id,
              |    CASE WHEN ts >= lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              |                 + INTERVAL '5 minutes'
              |           OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              |         THEN 1 ELSE 0 END AS new_session
              |  FROM events
              |), sessions AS (
              |  SELECT user_id, ts, value, event_id,
              |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
              |  FROM flagged
              |)
              |SELECT CAST(min(ts) AS TIMESTAMP) AS session_start,
              |  CAST(max(ts) + INTERVAL '5 minutes' AS TIMESTAMP) AS session_end,
              |  user_id, COUNT(*) AS n_events, ${sqlDsum("value")} AS sum_value
              |FROM sessions GROUP BY user_id, session_id
              |ORDER BY user_id, session_start""".stripMargin)),

    // As-of join: each purchase matched to the user's latest click at
    // or before it. Spark has no built-in as-of join; the idiomatic
    // rewrite is a union + last(_, ignoreNulls) running window — one
    // shuffle on user_id, no range explosion, scales linearly.
    QueryDef(
      "q28_asof_join",
      (s, d) => {
        val e = events(s, d).filter(col("event_type").isin("click", "purchase"))
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.withColumn("click_id",
            last(when(col("event_type") === "click", col("event_id")),
              ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase" && col("click_id").isNotNull)
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("click_id"))
          .orderBy("purchase_id")
      },
      Some("""SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id AND p.ts >= c.ts
             |ORDER BY purchase_id""".stripMargin)),

    // Map-typed column functions (§2.6 map family): parse props into
    // a map, then map_keys / size / element_at — the typed complement
    // of q24's string-path extraction. Keys sorted for cross-engine
    // determinism.
    QueryDef(
      "q66_map_funcs",
      (s, d) =>
        events(s, d)
          .select(col("event_id"),
            from_json(col("props"),
              org.apache.spark.sql.types.DataType.fromDDL("map<string,int>"))
              .as("m"))
          .select(col("event_id"),
            array_join(sort_array(map_keys(col("m"))), ",").as("keys"),
            size(col("m")).as("n_keys"),
            element_at(col("m"), "k").as("k_value"))
          .orderBy("event_id"),
      Some("""SELECT event_id,
             |  array_to_string(list_sort(json_keys(props)), ',') AS keys,
             |  CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
             |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value
             |FROM events ORDER BY event_id""".stripMargin)),

    // The reusable AsOfJoin API (operators.AsOfJoin) gated against
    // DuckDB's native ASOF JOIN — q28 checks the inline window
    // rewrite; this checks the library operator users actually call
    // (struct-carried right row, >= tie semantics).
    QueryDef(
      "q70_asof_api",
      (s, d) => {
        val e = events(s, d)
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = e.filter(col("event_type") === "click")
        graft.operators.AsOfJoin
          .asOfInner(purchases, clicks, "user_id", "ts", "ts",
            Map("event_id" -> "click_id"))
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("click_id"))
          .orderBy("purchase_id")
      },
      Some("""SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id AND p.ts >= c.ts
             |ORDER BY purchase_id""".stripMargin)),

    // SCD2 dimension build (the warehouse pattern the reference's dbt
    // layer materializes): each user's event stream becomes validity
    // intervals — valid_from = this event, valid_to = next event, open
    // interval = current row. One window shuffle on user_id; interval
    // construction is a per-row lead(), no self-join.
    QueryDef(
      "q120_scd2_build",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
        events(s, d)
          .select(col("user_id"), col("event_id"),
            col("event_type").as("state"), col("ts").as("valid_from"),
            lead(col("ts"), 1).over(w).as("valid_to"))
          .withColumn("is_current", col("valid_to").isNull)
          .orderBy("user_id", "valid_from", "event_id")
      },
      Some("""SELECT user_id, event_id, event_type AS state,
             |  CAST(ts AS TIMESTAMP) AS valid_from,
             |  CAST(lead(ts, 1) OVER w AS TIMESTAMP) AS valid_to,
             |  lead(ts, 1) OVER w IS NULL AS is_current
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
             |ORDER BY user_id, valid_from, event_id""".stripMargin)),

    // Cohort retention: users grouped by first-seen date, counted per
    // days-since-cohort offset — the product-analytics matrix. Two
    // hash aggs on user_id (first-seen, then distinct active days);
    // the cohort join-back stays keyed on user_id, no window over the
    // full stream.
    QueryDef(
      "q129_cohort_retention",
      (s, d) => {
        val e = events(s, d)
        val cohorts = e.groupBy("user_id")
          .agg(min(to_date(col("ts"))).as("cohort_date"))
        val active = e
          .select(col("user_id"), to_date(col("ts")).as("active_date"))
          .distinct()
        active.join(cohorts, "user_id")
          .groupBy(col("cohort_date"),
            datediff(col("active_date"), col("cohort_date"))
              .as("day_offset"))
          .agg(count_distinct(col("user_id")).as("n_active_users"))
          .orderBy("cohort_date", "day_offset")
      },
      Some("""WITH cohorts AS (
             |  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
             |  FROM events GROUP BY user_id
             |), active AS (
             |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_date
             |  FROM events
             |)
             |SELECT cohort_date,
             |  CAST(datediff('day', cohort_date, active_date) AS INTEGER)
             |    AS day_offset,
             |  COUNT(DISTINCT user_id) AS n_active_users
             |FROM active JOIN cohorts USING (user_id)
             |GROUP BY cohort_date, day_offset
             |ORDER BY cohort_date, day_offset""".stripMargin)),

    // Ordered funnel (view → click → purchase): per user, the earliest
    // occurrence of each stage, a stage counting only when it happens
    // AFTER the previous one. One hash agg (min ts per stage) then a
    // pure projection — no self-joins, no per-user sort.
    QueryDef(
      "q130_funnel",
      (s, d) => {
        val e = events(s, d)
        val stages = e
          .groupBy("user_id")
          .agg(
            min(when(col("event_type") === "view", col("ts"))).as("t_view"),
            min(when(col("event_type") === "click", col("ts")))
              .as("t_click"),
            min(when(col("event_type") === "purchase", col("ts")))
              .as("t_buy"))
        stages
          .select(col("user_id"),
            col("t_view").isNotNull.as("reached_view"),
            (col("t_click") > col("t_view")).as("reached_click"),
            (col("t_buy") > col("t_click") &&
              col("t_click") > col("t_view")).as("reached_purchase"))
          .agg(
            sum(when(col("reached_view"), 1L).otherwise(0L)).as("n_view"),
            sum(when(col("reached_click"), 1L).otherwise(0L))
              .as("n_view_click"),
            sum(when(col("reached_purchase"), 1L).otherwise(0L))
              .as("n_full_funnel"))
      },
      Some("""WITH stages AS (
             |  SELECT user_id,
             |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             |    MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             |    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
             |  FROM events GROUP BY user_id
             |)
             |SELECT
             |  CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_view,
             |  CAST(SUM(CASE WHEN t_click > t_view THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_view_click,
             |  CAST(SUM(CASE WHEN t_buy > t_click AND t_click > t_view
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
             |FROM stages""".stripMargin)),

    // Argmax aggregates (max_by / min_by): first and last event type
    // per user in ONE hash-agg pass — no window sort, no self-join.
    // The selection key is a fixed-width (epoch_us, event_id) string
    // so ties are impossible and both engines pick the same row.
    QueryDef(
      "q140_argmax",
      (s, d) => {
        val key = format_string("%020d%010d",
          unix_micros(col("ts")), col("event_id"))
        events(s, d)
          .groupBy("user_id")
          .agg(min_by(col("event_type"), key).as("first_event"),
            max_by(col("event_type"), key).as("last_event"),
            count(lit(1)).as("n_events"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
             |  min_by(event_type, printf('%020d%010d',
             |    epoch_us(CAST(ts AS TIMESTAMP)), event_id))
             |    AS first_event,
             |  max_by(event_type, printf('%020d%010d',
             |    epoch_us(CAST(ts AS TIMESTAMP)), event_id))
             |    AS last_event,
             |  COUNT(*) AS n_events
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Point-in-time (time-travel) lookup over the q120 SCD2 history:
    // for each (user, as-of instant) probe, the version whose
    // [valid_from, valid_to) interval contains the instant — the
    // "what did the dimension say when the fact happened" join every
    // warehouse backfill needs. The user_id equality conjunct makes it
    // a plain HASH join (the interval test is a residual filter over
    // that user's few versions), so at 100 TB it shuffles linearly on
    // the key — no range explosion, no nested loop. Equal-timestamp
    // versions produce an empty [t, t) interval that can never match,
    // so each probe resolves to at most one version.
    QueryDef(
      "q154_pit_lookup",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
        val ev = events(s, d)
        val scd = ev
          .select(col("user_id").as("s_user_id"),
            col("event_type").as("state"), col("ts").as("valid_from"),
            lead(col("ts"), 1).over(w).as("valid_to"))
        val probes = ev.select("user_id").distinct()
          .withColumn("asof_s",
            explode(array(lit("2024-01-08 00:00:00"),
              lit("2024-01-15 00:00:00"), lit("2024-01-22 00:00:00"))))
          .withColumn("asof", col("asof_s").cast("timestamp"))
          .drop("asof_s")
        probes.join(scd,
            probes("user_id") === scd("s_user_id") &&
              scd("valid_from") <= probes("asof") &&
              (scd("valid_to").isNull || probes("asof") < scd("valid_to")))
          .select(col("user_id"), col("asof"), col("state"),
            col("valid_from"))
          .orderBy("user_id", "asof")
      },
      Some("""WITH scd AS (
             |  SELECT user_id, event_type AS state,
             |    CAST(ts AS TIMESTAMP) AS valid_from,
             |    CAST(lead(ts, 1) OVER (PARTITION BY user_id
             |      ORDER BY ts ASC, event_id ASC) AS TIMESTAMP)
             |      AS valid_to
             |  FROM events
             |), probes AS (
             |  SELECT DISTINCT e.user_id, t.asof
             |  FROM events e, (
             |    SELECT TIMESTAMP '2024-01-08 00:00:00' AS asof
             |    UNION ALL SELECT TIMESTAMP '2024-01-15 00:00:00'
             |    UNION ALL SELECT TIMESTAMP '2024-01-22 00:00:00') t
             |)
             |SELECT p.user_id, p.asof, s.state, s.valid_from
             |FROM probes p JOIN scd s ON p.user_id = s.user_id
             |  AND s.valid_from <= p.asof
             |  AND (s.valid_to IS NULL OR p.asof < s.valid_to)
             |ORDER BY p.user_id, p.asof""".stripMargin)),

    // Linear interpolation over per-user daily gaps — the time-series
    // repair step after q125's gap fill: each user's daily mean value
    // on a dense day spine (min..max observed day per user), missing
    // days filled by the straight line between the flanking observed
    // days. prev/next come from IGNORE-NULLS window folds over the
    // left-joined spine (no self-join, no per-gap scan); the shuffle
    // is one hash partition by user. Daily means are exact-decimal
    // (davg) so both engines interpolate identical doubles, and the
    // blend is written `prev + (next - prev) * frac` on BOTH sides —
    // one shared IEEE evaluation order, bit-identical results.
    // Interior days only (spine bounded by observations), so prev and
    // next are always present on filled rows.
    QueryDef(
      "q158_interpolate",
      (s, d) => {
        val daily = events(s, d)
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(davg(col("value")).as("v"))
        val spine = daily.groupBy("user_id")
          .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
          .select(col("user_id").as("s_user_id"),
            explode(sequence(col("d0"), col("d1"),
              expr("interval 1 day"))).as("s_day"))
        val wPrev = Window.partitionBy("s_user_id").orderBy(col("s_day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wNext = Window.partitionBy("s_user_id").orderBy(col("s_day"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val joined = spine
          .join(daily, col("s_user_id") === col("user_id") &&
            col("s_day") === col("day"), "left")
          .select(col("s_user_id"), col("s_day"), col("v"),
            when(col("v").isNotNull, col("s_day")).as("obs_day"))
        val prevV = last(col("v"), ignoreNulls = true).over(wPrev)
        val prevD = last(col("obs_day"), ignoreNulls = true).over(wPrev)
        val nextV = first(col("v"), ignoreNulls = true).over(wNext)
        val nextD = first(col("obs_day"), ignoreNulls = true).over(wNext)
        val frac = datediff(col("day"), col("pd")).cast("double") /
          datediff(col("nd"), col("pd")).cast("double")
        joined
          .select(col("s_user_id").as("user_id"), col("s_day").as("day"),
            col("v"), prevV.as("pv"), prevD.as("pd"), nextV.as("nv"),
            nextD.as("nd"))
          .select(col("user_id"), col("day"),
            coalesce(col("v"),
              col("pv") + (col("nv") - col("pv")) * frac).as("value"),
            col("v").isNull.as("interpolated"))
          .orderBy("user_id", "day")
      },
      Some(s"""WITH daily AS (
              |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
              |    ${sqlDavg("value")} AS v
              |  FROM events GROUP BY 1, 2
              |), spine AS (
              |  SELECT user_id AS s_user_id,
              |    CAST(unnest(generate_series(min(day), max(day),
              |      INTERVAL 1 DAY)) AS DATE) AS s_day
              |  FROM daily GROUP BY user_id
              |), joined AS (
              |  SELECT s.s_user_id, s.s_day, d.v,
              |    CASE WHEN d.v IS NOT NULL THEN s.s_day END AS obs_day
              |  FROM spine s LEFT JOIN daily d
              |    ON s.s_user_id = d.user_id AND s.s_day = d.day
              |), flanked AS (
              |  SELECT s_user_id AS user_id, s_day AS day, v,
              |    last_value(v IGNORE NULLS) OVER wp AS pv,
              |    last_value(obs_day IGNORE NULLS) OVER wp AS pd,
              |    first_value(v IGNORE NULLS) OVER wn AS nv,
              |    first_value(obs_day IGNORE NULLS) OVER wn AS nd
              |  FROM joined
              |  WINDOW wp AS (PARTITION BY s_user_id ORDER BY s_day
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              |  wn AS (PARTITION BY s_user_id ORDER BY s_day
              |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
              |)
              |SELECT user_id, day,
              |  COALESCE(v, pv + (nv - pv) *
              |    (CAST(date_diff('day', pd, day) AS DOUBLE) /
              |     CAST(date_diff('day', pd, nd) AS DOUBLE))) AS value,
              |  v IS NULL AS interpolated
              |FROM flanked
              |ORDER BY user_id, day""".stripMargin)),

    // CDC changelog compaction — apply a Debezium-style change stream
    // to produce current state: per key, the HIGHEST-versioned change
    // wins, and if that change is a delete the key vanishes. The
    // events table is read as the changelog ('error' = tombstone,
    // anything else = upsert of that state), versioned by the same
    // fixed-width (epoch_us, event_id) key q140 established, so ties
    // are impossible. ONE max_by hash-agg resolves latest-wins — no
    // window sort over the changelog, no self-join; at 100 TB this is
    // a single keyed shuffle of partial maxima. Distinct from q100
    // (MERGE of a resolved batch) and q120 (full history build): this
    // is the compaction that turns a raw change FEED into a table.
    QueryDef(
      "q167_cdc_compact",
      (s, d) => {
        val ver = format_string("%020d%010d",
          unix_micros(col("ts")), col("event_id"))
        events(s, d)
          .groupBy("user_id")
          .agg(
            max_by(col("event_type"), ver).as("last_op"),
            max_by(col("value"), ver).as("last_value"),
            max(col("ts")).as("updated_at"),
            count(lit(1)).as("n_changes"))
          .filter(col("last_op") =!= "error")
          .select(col("user_id"), col("last_op").as("state"),
            col("last_value"), col("updated_at"), col("n_changes"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
             |  max_by(event_type, printf('%020d%010d',
             |    epoch_us(CAST(ts AS TIMESTAMP)), event_id)) AS state,
             |  max_by(value, printf('%020d%010d',
             |    epoch_us(CAST(ts AS TIMESTAMP)), event_id)) AS last_value,
             |  CAST(max(ts) AS TIMESTAMP) AS updated_at,
             |  COUNT(*) AS n_changes
             |FROM events
             |GROUP BY user_id
             |HAVING max_by(event_type, printf('%020d%010d',
             |    epoch_us(CAST(ts AS TIMESTAMP)), event_id)) <> 'error'
             |ORDER BY user_id""".stripMargin)),

    // Recency-decayed popularity per event type — the freshness-
    // weighted score a serving/ranking pipeline keeps per item, with
    // a one-week half-life. The decay weight is an EXACT POWER OF
    // TWO: w = 1 / (1 << weeks_old), weeks_old = age_days DIV 7
    // capped at 40 — integer shift + one double division, bit-equal
    // in any engine, where the usual exp(-λ·Δt)/pow(2, -Δt/h)
    // spellings hang the hash gate on libm (not bit-identical across
    // engines). value·w products are exact-decimal summed (dsum).
    // One linear pass + a broadcast 1-row max-date scalar; O(types)
    // state — at 100 TB the same shape folds incrementally (q175's
    // running-agg form) instead of rescanning.
    QueryDef(
      "q198_decayed_popularity",
      (s, d) => {
        val ev = events(s, d)
        val mx = ev.agg(max(to_date(col("ts"))).as("mxd"))
        ev.crossJoin(broadcast(mx))
          .select(col("event_type"), col("value"),
            least(floor(datediff(col("mxd"), to_date(col("ts"))) / 7)
              .cast("long"), lit(40L)).as("wk"))
          .select(col("event_type"),
            expr("value / shiftleft(1L, CAST(wk AS INT))").as("wv"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"), dsum(col("wv"))
            .as("decayed_value"))
          .orderBy("event_type")
      },
      Some(s"""WITH mx AS (
              |  SELECT MAX(CAST(ts AS DATE)) AS mxd FROM events
              |), wv AS (
              |  SELECT event_type,
              |    value / (1::BIGINT << CAST(LEAST(
              |      date_diff('day', CAST(ts AS DATE), mxd) // 7, 40)
              |      AS INTEGER)) AS wv
              |  FROM events CROSS JOIN mx
              |)
              |SELECT event_type, COUNT(*) AS n_events,
              |  ${sqlDsum("wv")} AS decayed_value
              |FROM wv GROUP BY event_type ORDER BY event_type""".stripMargin))
      ,

    // Gap + MAX-DURATION sessionization (operators.Sessionize),
    // oracle-gated: the max-duration split makes the session end
    // depend on its START — a recursion no window cumsum expresses
    // (q27's session_window is the gap-only form). Spark runs it as
    // the secondary-sort pattern: one repartition(user) +
    // sortWithinPartitions + a linear O(1)-state scan per partition —
    // exactly one shuffle at any corpus size. The rule IS
    // deterministic (total (user, ts, event_id) order), so DuckDB can
    // replay it with a recursive CTE stepping each user's event
    // sequence — fine at oracle SF (recursion depth = max events per
    // user, 86 at sf0.01), never the 100 TB path. 24 h gap / 72 h cap:
    // both split rules fire on this data (the cap splits sessions the
    // gap alone would keep).
    QueryDef(
      "q202_sessionize",
      (s, d) => {
        val ev = events(s, d).select(col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"))
        graft.operators.Sessionize.assign(ev, "user_id", "ts_us",
            "event_id", gapMicros = 86400000000L,
            maxLenMicros = 259200000000L)
          .orderBy(col("user_id"), col("event_id"))
          .select(col("user_id"), col("event_id"), col("session_seq"))
      },
      Some("""WITH RECURSIVE ev AS (
             |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             |    event_id,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
             |      AS rn
             |  FROM events
             |), sess AS (
             |  SELECT user_id, ts_us, event_id, rn,
             |    ts_us AS session_start, CAST(0 AS BIGINT) AS session_seq
             |  FROM ev WHERE rn = 1
             |  UNION ALL
             |  SELECT e.user_id, e.ts_us, e.event_id, e.rn,
             |    CASE WHEN e.ts_us - s.ts_us > 86400000000
             |        OR e.ts_us - s.session_start > 259200000000
             |      THEN e.ts_us ELSE s.session_start END,
             |    CASE WHEN e.ts_us - s.ts_us > 86400000000
             |        OR e.ts_us - s.session_start > 259200000000
             |      THEN s.session_seq + 1 ELSE s.session_seq END
             |  FROM ev e JOIN sess s
             |    ON e.user_id = s.user_id AND e.rn = s.rn + 1
             |)
             |SELECT user_id, event_id, session_seq FROM sess
             |ORDER BY user_id, event_id""".stripMargin)),

    // LAST-TOUCH ATTRIBUTION — the marketing-analytics composition of
    // the as-of join (an API gate: the declared query runs
    // operators.AsOfJoin.asOfWithin, the q70 library path, on its
    // natural use case): each purchase attributes to the same user's
    // most recent click-or-view at-or-before it, but only within a
    // 7-day lookback (a stale touch degrades to unattributed, kept as
    // NULL-touch rows so the unattributed rate is visible). At 100 TB
    // the as-of join is one union + one keyed window — no range
    // self-join blow-up; see AsOfJoin's scaladoc.
    QueryDef(
      "q251_last_touch_attribution",
      (s, d) => {
        val ev = events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val touches = ev
          .filter(col("event_type").isin("click", "view"))
          .select(col("user_id"), col("ts").as("t_ts"),
            col("event_id").as("t_id"),
            col("event_type").as("t_type"))
        graft.operators.AsOfJoin.asOfWithin(
            purchases, touches, "user_id", "ts", "t_ts",
            Map("t_id" -> "touch_event_id", "t_type" -> "touch_type",
              "t_ts" -> "touch_ts"),
            "7 days")
          .select(col("event_id"), col("user_id"),
            col("touch_event_id"), col("touch_type"),
            (unix_micros(col("ts")) - unix_micros(col("touch_ts")))
              .as("gap_us"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (
             |  SELECT event_id, user_id, ts FROM events
             |  WHERE event_type = 'purchase'
             |), t AS (
             |  SELECT user_id, ts AS t_ts, event_id AS t_id,
             |    event_type AS t_type
             |  FROM events WHERE event_type IN ('click', 'view')
             |), matched AS (
             |  SELECT p.event_id, p.user_id, p.ts,
             |    t.t_id, t.t_type, t.t_ts,
             |    row_number() OVER (PARTITION BY p.event_id
             |      ORDER BY t.t_ts DESC) AS rn
             |  FROM p JOIN t ON t.user_id = p.user_id
             |    AND t.t_ts <= p.ts
             |    AND t.t_ts >= p.ts - INTERVAL 7 DAY
             |)
             |SELECT p.event_id, p.user_id,
             |  m.t_id AS touch_event_id,
             |  m.t_type AS touch_type,
             |  CAST(epoch_us(p.ts) - epoch_us(m.t_ts) AS BIGINT)
             |    AS gap_us
             |FROM p LEFT JOIN matched m
             |  ON m.event_id = p.event_id AND m.rn = 1
             |ORDER BY p.event_id""".stripMargin)),

    // Conversion latency distribution — the metric on TOP of q251's
    // attribution rule: for every purchase with a view inside a
    // 6-hour window (the conversion), how long did it take? One row:
    // count, min/max and rank-picked quartiles of the latency — all
    // integer MICROSECONDS under a (latency, event_id) total order,
    // so no percentile interpolation and no float anywhere. The
    // as-of match is the same bounded window-join machinery as q251;
    // the quartile pick is one global sort of the (small) matched
    // set — at 100 TB the conversions table is orders of magnitude
    // smaller than the event log that produced it.
    QueryDef(
      "q275_conversion_latency",
      (s, d) => {
        val ev = events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts").as("t_ts"),
            col("event_id").as("t_id"))
        val lat = graft.operators.AsOfJoin.asOfWithin(
            purchases, views, "user_id", "ts", "t_ts",
            Map("t_id" -> "touch_event_id", "t_ts" -> "touch_ts"),
            "6 hours")
          .filter(col("touch_event_id").isNotNull)
          .select(col("event_id"),
            (unix_micros(col("ts")) - unix_micros(col("touch_ts")))
              .as("lat_us"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("lat_us"), col("event_id"))
        lat.withColumn("rk", row_number().over(w))
          .crossJoin(lat.agg(count(lit(1)).as("n")))
          .agg(max(col("n")).as("n_conversions"),
            min(col("lat_us")).as("min_us"),
            max(when(col("rk") === expr("(n + 3) DIV 4"),
              col("lat_us"))).as("p25_us"),
            max(when(col("rk") === expr("(n + 1) DIV 2"),
              col("lat_us"))).as("med_us"),
            max(when(col("rk") === expr("(3 * n + 3) DIV 4"),
              col("lat_us"))).as("p75_us"),
            max(col("lat_us")).as("max_us"))
      },
      Some("""WITH p AS (
             |  SELECT event_id, user_id, ts FROM events
             |  WHERE event_type = 'purchase'
             |), t AS (
             |  SELECT user_id, ts AS t_ts, event_id AS t_id
             |  FROM events WHERE event_type = 'view'
             |), matched AS (
             |  SELECT p.event_id,
             |    CAST(epoch_us(p.ts) - epoch_us(t.t_ts) AS BIGINT)
             |      AS lat_us,
             |    row_number() OVER (PARTITION BY p.event_id
             |      ORDER BY t.t_ts DESC) AS rn
             |  FROM p JOIN t ON t.user_id = p.user_id
             |    AND t.t_ts <= p.ts
             |    AND t.t_ts >= p.ts - INTERVAL 6 HOUR
             |), lat AS (
             |  SELECT event_id, lat_us FROM matched WHERE rn = 1
             |), ranked AS (
             |  SELECT lat_us,
             |    row_number() OVER (ORDER BY lat_us, event_id) AS rk,
             |    CAST(COUNT(*) OVER () AS BIGINT) AS n
             |  FROM lat
             |)
             |SELECT MAX(n) AS n_conversions,
             |  MIN(lat_us) AS min_us,
             |  MAX(CASE WHEN rk = (n + 3) // 4 THEN lat_us END)
             |    AS p25_us,
             |  MAX(CASE WHEN rk = (n + 1) // 2 THEN lat_us END)
             |    AS med_us,
             |  MAX(CASE WHEN rk = (3 * n + 3) // 4 THEN lat_us END)
             |    AS p75_us,
             |  MAX(lat_us) AS max_us
             |FROM ranked""".stripMargin))
  )
}
