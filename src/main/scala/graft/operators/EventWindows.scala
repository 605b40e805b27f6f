package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2e rows E1–E4: event-time windowing and stateful dedup,
  * batch-first over the `events` table so every semantics is
  * DuckDB-checkable. The same expressions run unchanged under Structured
  * Streaming (see graft.streaming.StreamOps); the reference has no
  * streaming surface (SURVEY.md §2e), so these are driver-mandated new
  * capability.
  *
  * Scale: tumbling/sliding buckets are pure projections (no shuffle until
  * the groupBy, which partial-aggregates); sessionization shuffles once on
  * user_id and sorts within partitions — at 100 TB that is one exchange
  * keyed by user, the same layout a streaming state store would use.
  */
object EventWindows extends QueryPack {

  private val TEN_MIN_MS = 600000L
  private val FIVE_MIN_MS = 300000L

  /** E1 — tumbling window aggregation, bucket as epoch millis (integer
    * floor arithmetic, identical in both engines).
    */
  def e1Tumbling(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("bucket_ms",
        unix_millis(col("ts")) - unix_millis(col("ts")) % TEN_MIN_MS)
      .groupBy("bucket_ms", "event_type")
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .orderBy("bucket_ms", "event_type")

  /** E1 — the same tumbling aggregation through Spark's native `window()`
    * (what a streaming job would write), projecting window start/end.
    */
  def e1TumblingNative(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type")

  /** E2 — sliding window (10 min window, 5 min slide): every event lands
    * in exactly two windows; Spark's `window()` does the expansion.
    */
  def e2Sliding(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("n_events"), col("sum_value"))
      .orderBy("window_start")

  /** E2 — session windows via gaps-and-islands (30 min inactivity gap):
    * the batch twin of `session_window(ts, gap)`, expressed with window
    * functions so DuckDB can check it value-for-value.
    */
  def e2Session(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val running = byUser.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    t(spark, dir, "events")
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ms").isNull ||
          unix_millis(col("ts")) - col("prev_ms") > 1800000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("is_new")).over(running))
      .groupBy("user_id", "session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        dsum(col("value")).as("session_value"))
      .orderBy("user_id", "session_seq")
  }

  /** E2 — session windows via Spark's NATIVE `session_window`
    * aggregation — the streaming-capable operator (the same node
    * `readStream.groupBy(session_window(...))` runs with state):
    * session consolidation happens inside the aggregate, replacing the
    * gaps-and-islands twin's two analytic-window passes. Same 30-min
    * inactivity-gap sessions as [[e2Session]] (an event extends a
    * session iff it arrives within the gap of the previous event —
    * identical split rule); the native window's end is last-event+gap,
    * so session bounds are re-derived as min/max event time and the
    * DuckDB oracle replays the islands form — value-for-value parity
    * between the two formulations IS the check.
    *
    * Scale (measured, SCALING.md, VERDICT r8 #10): the native form
    * posts sf1 6.8 s / slope 0.49 vs gaps-and-islands 5.7 s / 0.44 —
    * `SessionWindowStateStore`-shaped aggregation buys streaming
    * statefulness, not batch speed, so the islands form STAYS the
    * batch headline and this twin is the streaming-parity witness.
    */
  def e2SessionNative(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        dsum(col("value")).as("session_value"))
      .select("user_id", "session_start", "session_end", "n_events",
        "session_value")
      .orderBy("user_id", "session_start")

  /** E3 — watermark-style late-data handling, batch-checkable: drop
    * events older than (max event time − 1 hour), then aggregate — the
    * same cutoff `withWatermark("ts", "1 hour")` enforces in streaming.
    * The cutoff is a scalar subquery (planned as its own tiny job, then
    * a plain filter over the scan) rather than a crossJoin with the
    * 1-row aggregate, which would plan a nested-loop join node.
    */
  def e3Watermark(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(s"""
      SELECT event_type, count(*) AS n_events,
             ${sqlDsum("value")} AS sum_value
      FROM events
      WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 1 HOUR
      GROUP BY event_type ORDER BY event_type
    """)
  }

  /** E4 — stateful dedup with a deterministic keep rule: first event per
    * (user, type) by event time. `dropDuplicates` keeps an arbitrary row;
    * the row_number formulation pins the survivor (and is what
    * `dropDuplicatesWithinWatermark` does with state in streaming).
    */
  def e4DedupFirst(spark: SparkSession, dir: String): DataFrame = {
    val byKey = Window.partitionBy("user_id", "event_type")
      .orderBy("ts", "event_id")
    t(spark, dir, "events")
      .withColumn("rn", row_number().over(byKey))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "ts", "value")
      .orderBy("user_id", "event_type")
  }

  /** E — ordered funnel analysis: per user, did signup → view → click →
    * purchase happen IN ORDER (each step strictly after the previous
    * step's first occurrence)? One conditional aggregation per user
    * (min event time per step), then step predicates — the standard
    * funnel shape: a single shuffle on user_id, state of four
    * timestamps per user, no joins and no per-event window.
    */
  def e5Funnel(spark: SparkSession, dir: String): DataFrame = {
    def firstTs(t0: String) =
      min(when(col("event_type") === t0, col("ts"))).as(s"t_$t0")
    val perUser = t(spark, dir, "events")
      .groupBy("user_id")
      .agg(firstTs("signup"), firstTs("view"), firstTs("click"),
        firstTs("purchase"))
    // null-safe: a user who never reached a step has a NULL step time,
    // and NULL-comparison three-valued logic must collapse to false
    val s1 = col("t_signup").isNotNull
    val s2 = coalesce(s1 && col("t_view") > col("t_signup"), lit(false))
    val s3 = coalesce(s2 && col("t_click") > col("t_view"), lit(false))
    val s4 = coalesce(s3 && col("t_purchase") > col("t_click"),
      lit(false))
    perUser.select(col("user_id"),
        s1.as("reached_signup"), s2.as("reached_view"),
        s3.as("reached_click"), s4.as("reached_purchase"))
      .orderBy("user_id")
  }

  /** E — weekly cohort retention: users grouped by the week of their
    * first event; for each later week, the fraction of the cohort still
    * active. Two aggregations (first week per user, distinct active
    * weeks) joined on user — both shuffle on user_id and the cohort
    * sizes broadcast, so the event table is never shuffled twice.
    */
  def e6Retention(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val cohorts = ev.groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val active = ev
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    // cohort size == n_active at offset 0 (every user is active in
    // their own first week), so a window over the tiny per-(cohort,
    // offset) table replaces a second cohort aggregation + join; the
    // oracle keeps the independent sizes-join formulation, making the
    // identity itself part of the check
    val byCohort = Window.partitionBy("cohort_week")
    active.join(cohorts, "user_id")
      .withColumn("week_offset",
        (datediff(col("week"), col("cohort_week")) / 7).cast("long"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_active"))
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("n_active")))
          .over(byCohort))
      // raw integer-operand quotient — no half-way rounding hazard
      .withColumn("retention",
        col("n_active").cast("double") /
          col("cohort_size").cast("double"))
      .select("cohort_week", "week_offset", "n_active", "cohort_size",
        "retention")
      .orderBy("cohort_week", "week_offset")
  }

  /** B13 — source freshness as a query (ref: `FreshnessNodeOutput`
    * attachment, `A/fal/dbt/integration/parse.py:161-173`; the CLI
    * fixture `cli_tests/projects/010_source_freshness/`): per event
    * stream, the lag between its newest loaded_at (= max event ts) and
    * the pipeline clock, classified by dbt-style warn/error thresholds.
    * The clock is pinned to 1997-01-01 UTC so the check is
    * deterministic; the driver-facing API variant
    * (FalApi.sourceFreshnessSeconds) uses the wall clock.
    *
    * Millisecond epochs floor identically from the parquet ns values in
    * both engines (ns div 1e6), so the lag arithmetic is exact. Scale:
    * one partial max per source — the cheapest possible scan shape.
    */
  def b13Freshness(spark: SparkSession, dir: String): DataFrame = {
    val nowMs = 852076800000L // 1997-01-01T00:00:00Z
    val dayMs = 86400000L
    t(spark, dir, "events")
      .groupBy("event_type")
      .agg(max(unix_millis(col("ts"))).as("loaded_at_ms"))
      .withColumn("lag_ms", lit(nowMs) - col("loaded_at_ms"))
      .withColumn("status",
        when(col("lag_ms") <= 30 * dayMs, "pass")
          .when(col("lag_ms") <= 90 * dayMs, "warn")
          .otherwise("error"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b13_freshness" -> b13Freshness _,
    "e1_tumbling" -> e1Tumbling _,
    "e1_tumbling_native" -> e1TumblingNative _,
    "e2_sliding" -> e2Sliding _,
    "e2_session" -> e2Session _,
    "e2_session_native" -> e2SessionNative _,
    "e3_watermark" -> e3Watermark _,
    "e4_dedup_first" -> e4DedupFirst _,
    "e5_funnel" -> e5Funnel _,
    "e6_retention" -> e6Retention _)

  val oracles: Map[String, String] = Map(
    "b13_freshness" -> """
      WITH f AS (
        SELECT event_type, epoch_ms(max(ts)) AS loaded_at_ms
        FROM events GROUP BY event_type
      )
      SELECT event_type, loaded_at_ms,
             852076800000 - loaded_at_ms AS lag_ms,
             CASE WHEN 852076800000 - loaded_at_ms <= 2592000000
                  THEN 'pass'
                  WHEN 852076800000 - loaded_at_ms <= 7776000000
                  THEN 'warn'
                  ELSE 'error' END AS status
      FROM f ORDER BY event_type""",
    "e6_retention" -> """
      WITH cohorts AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id
      ),
      active AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS week
        FROM events
      ),
      sizes AS (
        SELECT cohort_week, count(*) AS cohort_size
        FROM cohorts GROUP BY cohort_week
      ),
      r AS (
        SELECT c.cohort_week,
               CAST(date_diff('day', CAST(c.cohort_week AS DATE),
                 CAST(a.week AS DATE)) // 7 AS BIGINT) AS week_offset,
               count(*) AS n_active
        FROM active a JOIN cohorts c ON a.user_id = c.user_id
        GROUP BY 1, 2
      )
      SELECT CAST(r.cohort_week AS TIMESTAMP) AS cohort_week,
             week_offset, n_active, cohort_size,
             CAST(n_active AS DOUBLE) /
               CAST(cohort_size AS DOUBLE) AS retention
      FROM r JOIN sizes USING (cohort_week)
      ORDER BY cohort_week, week_offset""",
    "e5_funnel" -> """
      WITH per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN ts END)
                 AS t_signup,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               min(CASE WHEN event_type = 'purchase' THEN ts END)
                 AS t_purchase
        FROM events GROUP BY user_id
      )
      SELECT user_id,
             (t_signup IS NOT NULL) AS reached_signup,
             coalesce(t_signup IS NOT NULL AND t_view > t_signup, false)
               AS reached_view,
             coalesce(t_signup IS NOT NULL AND t_view > t_signup
               AND t_click > t_view, false) AS reached_click,
             coalesce(t_signup IS NOT NULL AND t_view > t_signup
               AND t_click > t_view AND t_purchase > t_click, false)
               AS reached_purchase
      FROM per_user ORDER BY user_id""",
    "e1_tumbling" -> s"""
      SELECT (epoch_ms(ts) // 600000) * 600000 AS bucket_ms, event_type,
             count(*) AS n_events, ${sqlDsum("value")} AS sum_value
      FROM events GROUP BY bucket_ms, event_type
      ORDER BY bucket_ms, event_type""",
    "e1_tumbling_native" -> s"""
      SELECT make_timestamp((epoch_ms(ts) // 600000) * 600000000)
               AS window_start,
             make_timestamp(((epoch_ms(ts) // 600000) + 1) * 600000000)
               AS window_end,
             event_type,
             count(*) AS n_events, ${sqlDsum("value")} AS sum_value
      FROM events GROUP BY window_start, window_end, event_type
      ORDER BY window_start, event_type""",
    "e2_sliding" -> s"""
      WITH expanded AS (
        SELECT unnest([
                 (epoch_ms(ts) // 300000) * 300000 - 300000,
                 (epoch_ms(ts) // 300000) * 300000]) AS start_ms,
               value
        FROM events
      )
      SELECT make_timestamp(start_ms * 1000) AS window_start,
             count(*) AS n_events, ${sqlDsum("value")} AS sum_value
      FROM expanded GROUP BY window_start ORDER BY window_start""",
    "e2_session" -> s"""
      WITH marked AS (
        SELECT user_id, event_id, ts, value,
               lag(epoch_ms(ts)) OVER w AS prev_ms
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ),
      flagged AS (
        SELECT *, CASE WHEN prev_ms IS NULL
                         OR epoch_ms(ts) - prev_ms > 1800000
                       THEN 1 ELSE 0 END AS is_new
        FROM marked
      ),
      sessions AS (
        SELECT *, CAST(sum(is_new) OVER
          (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS session_seq
        FROM flagged
      )
      SELECT user_id, session_seq, count(*) AS n_events,
             min(ts) AS session_start, max(ts) AS session_end,
             ${sqlDsum("value")} AS session_value
      FROM sessions GROUP BY user_id, session_seq
      ORDER BY user_id, session_seq""",
    "e2_session_native" -> s"""
      WITH marked AS (
        SELECT user_id, event_id, ts, value,
               lag(epoch_ms(ts)) OVER w AS prev_ms
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ),
      flagged AS (
        SELECT *, CASE WHEN prev_ms IS NULL
                         OR epoch_ms(ts) - prev_ms > 1800000
                       THEN 1 ELSE 0 END AS is_new
        FROM marked
      ),
      sessions AS (
        SELECT *, CAST(sum(is_new) OVER
          (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS session_seq
        FROM flagged
      )
      SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
             count(*) AS n_events, ${sqlDsum("value")} AS session_value
      FROM sessions GROUP BY user_id, session_seq
      ORDER BY user_id, session_start""",
    "e3_watermark" -> s"""
      SELECT event_type, count(*) AS n_events,
             ${sqlDsum("value")} AS sum_value
      FROM events
      WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 1 HOUR
      GROUP BY event_type ORDER BY event_type""",
    "e4_dedup_first" -> """
      SELECT user_id, event_type, event_id, ts, value FROM (
        SELECT *, row_number() OVER
          (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        FROM events
      ) WHERE rn = 1
      ORDER BY user_id, event_type""")
}
