package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.Tables

/** Windowed event analytics over `events(event_id, ts, user_id,
  * event_type, value, props)` — the batch forms of the Structured
  * Streaming operators (SURVEY §2.4 ST2–ST5).
  *
  * The streaming implementations in `graft.streaming` run the same
  * expressions over `readStream`; the convergence spec asserts the final
  * streaming state equals these batch results, and the DuckDB oracle
  * checks the batch results here.
  */
object EventQueries {

  /** Shared Spark/DuckDB SQL for `ev_anomaly` — identical text so the
    * IEEE op order matches; the window sums are exact decimals.
    */
  val anomalySql: String = """WITH st AS (
      SELECT event_id, user_id, value,
        count(*) OVER w AS n,
        CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS s1,
        CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS s2
      FROM events WINDOW w AS (PARTITION BY user_id)),
    z AS (
      SELECT event_id, value, n,
        s1 / n AS mu,
        CASE WHEN n > 1 THEN (s2 - s1 * s1 / n) / (n - 1) ELSE 0.0 END AS va
      FROM st)
    SELECT event_id,
      round(CASE WHEN va > 0 THEN (value - mu) / sqrt(va) ELSE 0.0 END, 6) AS z,
      CASE WHEN va > 0 AND abs((value - mu) / sqrt(va)) > 2.0 THEN TRUE ELSE FALSE END AS is_outlier
    FROM z ORDER BY event_id"""

  val defs: Seq[QueryDef] = Seq(

    // ── ST2a tumbling window ─────────────────────────────────────────
    QueryDef(
      "st_tumbling_window",
      (s, dir) =>
        Tables.load(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
          .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_value"))
          .orderBy(col("ws"), col("event_type")),
      Some("""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws, event_type,
          count(*) AS n,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY ws, event_type"""),
      doc = "Epoch-aligned 1h tumbling window ≙ date_trunc('hour')."),

    // ── ST2b sliding window (30 min width, 10 min slide) ─────────────
    QueryDef(
      "st_sliding_window",
      (s, dir) =>
        Tables.load(s, dir, "events")
          .groupBy(window(col("ts"), "30 minutes", "10 minutes"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
          .select(col("window.start").as("ws"), col("n"), col("sum_value"))
          .orderBy(col("ws")),
      Some("""WITH expanded AS (
          SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) - k * 600) AS TIMESTAMP) AS ws,
            ts, value
          FROM events, unnest([0, 1, 2]) AS t(k))
        SELECT ws, count(*) AS n,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM expanded
        WHERE ts >= ws AND ts < ws + to_seconds(CAST(1800 AS BIGINT))
        GROUP BY ws ORDER BY ws"""),
      doc = "Each event lands in ceil(30/10)=3 windows; oracle expands explicitly."),

    // ── ST3 session window (gap-based) ───────────────────────────────
    QueryDef(
      "st_session_window",
      (s, dir) =>
        Tables.load(s, dir, "events")
          .groupBy(session_window(col("ts"), "4 hours"), col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
          .select(
            col("user_id"),
            col("session_window.start").as("session_start"),
            col("session_window.end").as("session_end"),
            col("n_events"), col("sum_value"))
          .orderBy(col("user_id"), col("session_start")),
      Some("""WITH marked AS (
          SELECT user_id, ts, value, event_id,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 4 HOUR THEN 1 ELSE 0 END AS new_session
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        numbered AS (
          SELECT user_id, ts, value,
            sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
          FROM marked)
        SELECT user_id,
          min(ts) AS session_start,
          max(ts) + INTERVAL 4 HOUR AS session_end,
          count(*) AS n_events,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM numbered GROUP BY user_id, session_no
        ORDER BY user_id, session_start"""),
      doc = "session_window(gap) ≙ gaps-and-islands; end = max(ts) + gap."),

    // ── ST5 stateful dedup (batch analogue, deterministic keep-first) ─
    QueryDef(
      "st_dedup_events",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts").asc, col("event_id").asc)
        Tables.load(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
          .orderBy(col("user_id"), col("event_type"))
      },
      Some("""SELECT user_id, event_type, event_id, ts FROM (
          SELECT user_id, event_type, event_id, ts,
            row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC) AS rn
          FROM events) WHERE rn = 1
        ORDER BY user_id, event_type"""),
      doc = "Batch form of dropDuplicatesWithinWatermark(user_id, event_type)."),

    // ── as-of (attribution) join: purchase → latest prior click ──────
    QueryDef(
      "ev_asof_attribution",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        graft.operators.AsOfJoin.backward(
            purchases, clicks, key = "user_id",
            leftTs = "ts", rightTs = "ts",
            rightPayload = Seq("event_id"), rightTiebreak = "event_id")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("ts").as("purchase_ts"),
            col("asof_event_id").as("click_id"), col("asof_ts").as("click_ts"))
          .orderBy(col("purchase_id"))
      },
      Some("""SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
          c.click_id, c.click_ts
        FROM events p
        LEFT JOIN LATERAL (
          SELECT c0.event_id AS click_id, c0.ts AS click_ts
          FROM events c0
          WHERE c0.event_type = 'click' AND c0.user_id = p.user_id AND c0.ts <= p.ts
          ORDER BY c0.ts DESC, c0.event_id DESC LIMIT 1) c ON true
        WHERE p.event_type = 'purchase'
        ORDER BY purchase_id"""),
      doc = "Backward as-of join (union + single key shuffle + ordered " +
        "window), the scalable shape for time-series attribution; oracle " +
        "is the per-row LATERAL formulation."),

    // ── funnel analysis: view → click → purchase, strictly ordered ───
    // Per user, each stage's timestamp must follow the previous stage's.
    // Shape: three filtered aggs + two equi-joins on user_id — every
    // stage shrinks the key set, so the joins get cheaper as the funnel
    // narrows; no window over the full event stream.
    QueryDef(
      "ev_funnel",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        def stage(tpe: String) = ev.filter(col("event_type") === tpe)
        val v = stage("view").groupBy(col("user_id"))
          .agg(min(col("ts")).as("t_view"))
        val c = stage("click").join(v, "user_id")
          .filter(col("ts") > col("t_view"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
        val p = stage("purchase").join(c, "user_id")
          .filter(col("ts") > col("t_click"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
        val one = (df: org.apache.spark.sql.DataFrame, nm: String, ord: Int) =>
          df.agg(count(lit(1)).as("n_users"))
            .select(lit(ord).as("stage_no"), lit(nm).as("stage"), col("n_users"))
        one(v, "view", 1).unionByName(one(c, "view>click", 2))
          .unionByName(one(p, "view>click>purchase", 3))
          .orderBy(col("stage_no"))
      },
      Some("""WITH v AS (
          SELECT user_id, min(ts) AS t_view FROM events
          WHERE event_type = 'view' GROUP BY user_id),
        c AS (
          SELECT e.user_id, min(e.ts) AS t_click FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY e.user_id),
        p AS (
          SELECT e.user_id, min(e.ts) AS t_purchase FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY e.user_id)
        SELECT 1 AS stage_no, 'view' AS stage, count(*) AS n_users FROM v
        UNION ALL SELECT 2, 'view>click', count(*) FROM c
        UNION ALL SELECT 3, 'view>click>purchase', count(*) FROM p
        ORDER BY stage_no""")),

    // ── cohort retention: first-seen day × active-on-day-N ───────────
    QueryDef(
      "ev_retention",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("d"))
        val cohort = ev.groupBy(col("user_id")).agg(min(col("d")).as("cohort_day"))
        val activity = ev.distinct()
        cohort.join(activity, "user_id")
          .groupBy(col("cohort_day"))
          .agg(
            countDistinct(col("user_id")).as("cohort_size"),
            countDistinct(when(col("d") === date_add(col("cohort_day"), 1),
              col("user_id"))).as("retained_d1"),
            countDistinct(when(col("d") === date_add(col("cohort_day"), 3),
              col("user_id"))).as("retained_d3"))
          .orderBy(col("cohort_day"))
      },
      Some("""WITH ev AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        cohort AS (
          SELECT user_id, min(d) AS cohort_day FROM ev GROUP BY user_id)
        SELECT cohort_day,
          count(DISTINCT ev.user_id) AS cohort_size,
          count(DISTINCT CASE WHEN ev.d = cohort_day + 1 THEN ev.user_id END) AS retained_d1,
          count(DISTINCT CASE WHEN ev.d = cohort_day + 3 THEN ev.user_id END) AS retained_d3
        FROM cohort JOIN ev USING (user_id)
        GROUP BY cohort_day ORDER BY cohort_day"""),
      doc = "Cohort = first-seen day; one shuffle to cohorts, one to the report."),

    // ── EWMA per user (α = 1/2) — time-series smoothing ──────────────
    // e_i = α·v_i + (1−α)·e_{i−1} is inherently sequential, so it runs
    // as an ordered left-fold per key: collect the (tiny) per-user event
    // sequence and fold with the codegen'd `aggregate` HOF — one shuffle
    // on user_id, no window-function state. α = 1/2 keeps every weight a
    // power of two (exact in binary), and both engines fold in the same
    // order, so the doubles are bit-identical. At 100 TB the per-key
    // sequences stay bounded (sessions/devices), not corpus-sized; for
    // unbounded keys the streaming form is transformWithState
    // (EventStreams.statefulUserAggTws) with the same recurrence.
    QueryDef(
      "ev_ewma",
      (s, dir) =>
        Tables.load(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(sort_array(collect_list(
            struct(col("ts"), col("event_id"), col("value")))).as("seq"))
          .select(col("user_id"),
            expr("round(aggregate(seq, cast(0.0 as double), (acc, x) -> 0.5 * x.value + 0.5 * acc), 6)")
              .as("ewma"),
            size(col("seq")).cast("bigint").as("n_events"))
          .orderBy(col("user_id")),
      Some("""WITH seq AS (
          SELECT user_id, list(value ORDER BY ts, event_id) AS vs
          FROM events GROUP BY user_id)
        SELECT user_id,
          round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), vs),
            (acc, x) -> 0.5 * x + 0.5 * acc), 6) AS ewma,
          len(vs) AS n_events
        FROM seq ORDER BY user_id"""),
      doc = "DuckDB list_reduce seeds from the head element, so the oracle " +
        "prepends the 0.0 init to make the folds element-for-element identical."),

    // ── per-event session assignment (gaps-and-islands) ──────────────
    // st_session_window AGGREGATES sessions; this emits the session
    // NUMBER on every event row (the form downstream featurization
    // joins against). Two stacked windows on the same (user_id, ts)
    // ordering — one shuffle, the second window reuses the sort.
    QueryDef(
      "ev_session_ids",
      (s, dir) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        Tables.load(s, dir, "events")
          // µs-exact gap test (cast-to-long is SECONDS and truncates —
          // a sub-second straddle of the 4 h boundary would disagree
          // with the µs-precise oracle)
          .withColumn("new_session",
            when(unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser)
              > 14400000000L || lag(col("ts"), 1).over(byUser).isNull, 1L).otherwise(0L))
          .withColumn("session_no",
            sum(col("new_session")).over(
              byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select(col("event_id"), col("user_id"), col("ts"), col("session_no"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id, ts,
          CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
        FROM (
          SELECT event_id, user_id, ts,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 14400000000
                 THEN 1 ELSE 0 END AS new_session
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        ORDER BY event_id"""),
      doc = "4h-gap sessionization emitting per-row session numbers, " +
        "µs-exact on both engines."),

    // ── per-user z-score anomaly flags ───────────────────────────────
    // Outlier detection over each user's value distribution. Mean and
    // variance come from EXACT decimal sums over an unordered window
    // (float accumulation order would differ between engines), converted
    // to double through one shared expression text — bit-identical z.
    QueryDef(
      "ev_anomaly",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql(anomalySql)
      },
      Some(anomalySql)),

    // ── late-data semantics: watermark cutoff as a batch filter ──────
    QueryDef(
      "st_watermark_filter",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        // watermark = max(ts) - 10 minutes; events older than the
        // watermark at end-of-stream would have been dropped in append
        // mode. Batch replay: join against the scalar max.
        val wm = ev.agg(max(col("ts")).as("max_ts"))
        ev.crossJoin(broadcast(wm))
          .filter(col("ts") >= col("max_ts") - expr("INTERVAL 10 MINUTES"))
          .select(col("event_id"), col("ts"), col("event_type"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, ts, event_type FROM events
        WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 10 MINUTE
        ORDER BY event_id"""))
  )
}
