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
    * a partition-keyed window over that tiny aggregate.
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
        round(col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy("prev_type"))
            .cast("double"), 6))
      .orderBy("prev_type", "event_type")
  }

  /** Top-20 daily session paths: the ordered event-type sequence per
    * (user, day), counted across sessions. The path assembles in-row
    * (collect_list → array_sort by (ts, event_id) → join) — state is
    * one session's events, never a global sort; the top-20 head is
    * TakeOrderedAndProject with a total (count desc, path) order so
    * ties cannot flap.
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e9_transitions" -> e9Transitions _,
    "e10_paths" -> e10Paths _,
    "e11_attribution" -> e11Attribution _)

  val oracles: Map[String, String] = Map(
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
             round(CAST(n AS DOUBLE) /
               CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6)
               AS p
      FROM counts ORDER BY prev_type, event_type""",
    "e10_paths" -> """
      WITH sessions AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM events GROUP BY user_id, CAST(ts AS DATE))
      SELECT path, count(*) AS n_sessions
      FROM sessions GROUP BY path
      ORDER BY n_sessions DESC, path LIMIT 20""")
}
