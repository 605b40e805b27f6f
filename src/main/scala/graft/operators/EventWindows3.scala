package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 event-sequence analytics: Markov transition tables and
  * top session paths — the clickstream queries a product-analytics
  * deployment of the reference runs downstream of its event models.
  */
object EventWindows3 extends QueryPack {

  /** First-order Markov transitions: for every consecutive event pair
    * within a user's stream, count (prev → next) and the conditional
    * transition probability. One keyed window (lag over user_id) + one
    * aggregation to |event_types|² rows; the probability normalizer is
    * a partition-keyed window over that tiny aggregate. The probability
    * is the RAW integer-operand quotient (no round(·, 6)): identical
    * bits in both engines, no half-way-point hazard.
    */
  def e9Transitions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val counts = t(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        lag(col("event_type"), 1).over(byUser).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy("prev_type", "event_type")
      .agg(count(lit(1)).as("n"))
    counts.withColumn("p",
        col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy("prev_type"))
            .cast("double"))
      .orderBy("prev_type", "event_type")
  }

  /** Top-20 daily session paths: the ordered event-type sequence per
    * (user, day), counted across sessions. The path assembles in-row
    * (collect_list → array_sort by (ts, event_id) → join) — state is
    * one session's events, never a global sort; the top-20 head is
    * TakeOrderedAndProject with a total (count desc, path) order so
    * ties cannot flap. Both engines sort sessions by the identical
    * (ts, event_id, event_type) total order — the struct sort uses all
    * three fields, so the oracle's ORDER BY lists all three too.
    */
  def e10Paths(spark: SparkSession, dir: String): DataFrame = {
    val sessions = t(spark, dir, "events")
      .select(col("user_id"), col("ts").cast("date").as("day"),
        col("ts"), col("event_id"), col("event_type"))
      .groupBy("user_id", "day")
      .agg(concat_ws(">",
        transform(
          array_sort(collect_list(
            struct(col("ts"), col("event_id"), col("event_type")))),
          s => s.getField("event_type"))).as("path"))
    sessions.groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(20)
  }

  /** Last-touch attribution with a time cap: each purchase credits the
    * user's most recent click if it happened within the hour, else
    * counts as organic; results roll up to (day, channel) conversions
    * and revenue. One user-keyed ignore-nulls window (the as-of idiom)
    * + one keyed aggregation — no self-join of the event stream.
    */
  def e11Attribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val lastClickMs = last(
      when(col("event_type") === "click", unix_millis(col("ts"))),
      ignoreNulls = true).over(w)
    t(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("last_click_ms", lastClickMs)
      .filter(col("event_type") === "purchase")
      .withColumn("channel",
        when(col("last_click_ms").isNotNull &&
          unix_millis(col("ts")) - col("last_click_ms") <= 3600000L,
          lit("click")).otherwise(lit("organic")))
      .groupBy(col("ts").cast("date").as("day"), col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        dsum(col("value")).as("revenue"))
      .orderBy("day", "channel")
  }

  /** Activation latency per signup cohort: for every user, time from
    * first signup to the first purchase at-or-after it; per daily
    * cohort — conversion rate and the exact median latency. One
    * user-keyed window finds the signup anchor, one keyed aggregation
    * reduces to a per-user row, and the median runs the shared
    * exact-rank idiom over the per-cohort user table (entity-sized,
    * not event-sized).
    */
  def e13TimeToConvert(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    val ev = t(spark, dir, "events")
      .filter(col("event_type").isin("signup", "purchase"))
      .withColumn("signup_ms",
        min(when(col("event_type") === "signup", unix_millis(col("ts"))))
          .over(byUser))
      .filter(col("signup_ms").isNotNull)
    val perUser = ev.groupBy("user_id")
      .agg(min(col("signup_ms")).as("signup_ms"),
        min(when(col("event_type") === "purchase" &&
          unix_millis(col("ts")) >= col("signup_ms"),
          unix_millis(col("ts")))).as("purchase_ms"))
      .withColumn("cohort",
        date_trunc("day", timestamp_millis(col("signup_ms")))
          .cast("date"))
      .withColumn("latency_ms", col("purchase_ms") - col("signup_ms"))
    val med = exactMedianBy(
      perUser.filter(col("latency_ms").isNotNull)
        .select(col("cohort"), col("latency_ms")),
      "cohort", "latency_ms", "p50_latency_ms")
    perUser.groupBy("cohort")
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("latency_ms").isNotNull, 1L).otherwise(0L))
          .as("n_converted"))
      .withColumn("conv_rate",
        col("n_converted").cast("double") / col("n_users").cast("double"))
      .join(broadcast(med), Seq("cohort"), "left")
      .orderBy("cohort")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e9_transitions" -> e9Transitions _,
    "e10_paths" -> e10Paths _,
    "e11_attribution" -> e11Attribution _,
    "e13_time_to_convert" -> e13TimeToConvert _)

  val oracles: Map[String, String] = Map(
    "e13_time_to_convert" -> s"""
      WITH ev AS (
        SELECT user_id, event_type, epoch_ms(ts) AS ms,
               min(CASE WHEN event_type = 'signup'
                 THEN epoch_ms(ts) END) OVER (PARTITION BY user_id)
                 AS signup_ms
        FROM events WHERE event_type IN ('signup', 'purchase')),
      per_user AS (
        SELECT user_id, min(signup_ms) AS signup_ms,
               min(CASE WHEN event_type = 'purchase'
                    AND ms >= signup_ms THEN ms END) AS purchase_ms
        FROM ev WHERE signup_ms IS NOT NULL GROUP BY user_id),
      cohorts AS (
        SELECT user_id,
               CAST(date_trunc('day', make_timestamp(signup_ms * 1000))
                 AS DATE) AS cohort,
               purchase_ms - signup_ms AS latency_ms
        FROM per_user),
      lat AS (SELECT cohort, latency_ms FROM cohorts
              WHERE latency_ms IS NOT NULL),
      ${sqlMedianByCtes("m", "lat", "cohort", "latency_ms",
        "p50_latency_ms")}
      SELECT c.cohort, count(*) AS n_users,
             CAST(sum(CASE WHEN latency_ms IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_converted,
             CAST(sum(CASE WHEN latency_ms IS NOT NULL THEN 1 ELSE 0 END)
               AS DOUBLE) / CAST(count(*) AS DOUBLE) AS conv_rate,
             max(p50_latency_ms) AS p50_latency_ms
      FROM cohorts c LEFT JOIN mmed ON c.cohort = mmed.cohort
      GROUP BY c.cohort ORDER BY c.cohort""",
    "e11_attribution" -> s"""
      WITH touched AS (
        SELECT event_type, ts, value,
               last_value(CASE WHEN event_type = 'click'
                 THEN epoch_ms(ts) END IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS last_click_ms
        FROM events WHERE event_type IN ('click', 'purchase')),
      attributed AS (
        SELECT CAST(ts AS DATE) AS day,
               CASE WHEN last_click_ms IS NOT NULL
                     AND epoch_ms(ts) - last_click_ms <= 3600000
                    THEN 'click' ELSE 'organic' END AS channel,
               value
        FROM touched WHERE event_type = 'purchase')
      SELECT day, channel, count(*) AS n_purchases,
             ${sqlDsum("value")} AS revenue
      FROM attributed GROUP BY day, channel
      ORDER BY day, channel""",
    "e9_transitions" -> """
      WITH pairs AS (
        SELECT lag(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS prev_type,
               event_type
        FROM events),
      counts AS (
        SELECT prev_type, event_type, count(*) AS n
        FROM pairs WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type)
      SELECT prev_type, event_type, n,
             CAST(n AS DOUBLE) /
               CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE)
               AS p
      FROM counts ORDER BY prev_type, event_type""",
    "e10_paths" -> """
      WITH sessions AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               string_agg(event_type, '>'
                 ORDER BY ts, event_id, event_type) AS path
        FROM events GROUP BY user_id, CAST(ts AS DATE))
      SELECT path, count(*) AS n_sessions
      FROM sessions GROUP BY path
      ORDER BY n_sessions DESC, path LIMIT 20""")
}
