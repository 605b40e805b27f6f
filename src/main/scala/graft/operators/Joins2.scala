package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join capabilities beyond Spark's built-in strategies (SURVEY.md C7
  * note: "range/as-of join … we expose them as engine capabilities"),
  * each composed from existing operators per the builder's preference
  * order (a) — no custom strategy needed, and each shaped for 100 TB:
  *
  *  - as-of join: one shuffle on the partition key + a per-partition
  *    ordered scan (ignore-nulls last_value), not a per-row probe;
  *  - range join: time-bucket band join turns a pure inequality
  *    predicate (which Spark would BNL-join quadratically) into an
  *    equi-join with bounded bucket fan-out;
  *  - salted join: deterministic salt + replicated build side spreads a
  *    skewed key across `SALT` reducers (manual twin of AQE skew-join).
  */
object Joins2 extends QueryPack {

  /** As-of join: each purchase matched to the user's last strictly
    * preceding click. DuckDB's native ASOF JOIN is the oracle's cross
    * check, but both sides here use the deterministic window
    * formulation (ties broken on event_id).
    */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
    val before = Window.partitionBy("user_id")
      .orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    ev
      .withColumn("last_click_id",
        last(when(col("event_type") === "click", col("event_id")),
          ignoreNulls = true).over(before))
      .withColumn("last_click_ts",
        last(when(col("event_type") === "click", col("ts")),
          ignoreNulls = true).over(before))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("last_click_id"),
        col("last_click_ts"))
      .orderBy("purchase_id")
  }

  /** As-of join on the NATIVE operator (graft.plans.AsOfJoin — custom
    * LogicalPlan + Strategy + merge-pass SparkPlan): purchases matched
    * to the latest click at or before them per user. The right side is
    * deduped to one row per (user, ts) so the match is unique and the
    * oracle — DuckDB's built-in ASOF LEFT JOIN — is deterministic.
    * Unlike the window formulation above, neither side is unioned or
    * widened: each shuffles once on the key and streams through the
    * merge with O(1) state.
    */
  def qAsofJoinNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts").as("click_ts"))
      .agg(max(col("event_id")).as("click_id"))
      .select(col("user_id"), col("click_ts"), col("click_id"))
    graft.plans.AsOf.join(purchases, clicks, Seq("user_id"),
        "ts", "click_ts")
      .toDF("purchase_id", "user_id", "purchase_ts", "r_user_id",
        "click_ts", "click_id")
      .select("purchase_id", "user_id", "purchase_ts", "click_id",
        "click_ts")
      .orderBy("purchase_id")
  }

  /** Pure-range join via time buckets: count clicks within the 60 s
    * before each error, with no equi key. The probe side explodes to two
    * adjacent 60 s buckets, making it an equi-join on bucket; each
    * click lives in exactly one bucket so no pair double-counts.
    */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val B = 60000L
    val ev = t(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        unix_millis(col("ts")).as("click_ms"))
      .withColumn("bucket", expr(s"click_ms div $B"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"),
        unix_millis(col("ts")).as("error_ms"))
      .withColumn("bucket",
        explode(array(expr(s"error_ms div $B - 1"), expr(s"error_ms div $B"))))
    errors.join(clicks, Seq("bucket"))
      .filter(col("error_ms") - col("click_ms") >= 0 &&
        col("error_ms") - col("click_ms") <= B)
      .groupBy("error_id")
      .agg(count(lit(1)).as("n_recent_clicks"))
      .orderBy("error_id")
  }

  /** Salted join: the per-status totals dim has 3 rows — an extreme-skew
    * key. The build side replicates ×16 salts, the probe side salts
    * deterministically, so each hot key spreads over 16 reducers. The
    * oracle is the plain unsalted join — results must be identical.
    */
  def qSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val SALT = 16
    val orders = t(spark, dir, "orders")
    val statusTotals = orders.groupBy("o_orderstatus")
      .agg(dsum(col("o_totalprice")).as("status_total"))
      .withColumn("salt", explode(sequence(lit(0), lit(SALT - 1))))
    orders
      .withColumn("salt", (col("o_orderkey") % SALT).cast("int"))
      .join(statusTotals, Seq("o_orderstatus", "salt"))
      .select(col("o_orderkey"), col("o_orderstatus"),
        (col("o_totalprice") / col("status_total")).as("share_of_status"))
      .orderBy("o_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> qAsofJoin _,
    "q_asof_join_native" -> qAsofJoinNative _,
    "q_range_join" -> qRangeJoin _,
    "q_salted_join" -> qSaltedJoin _)

  val oracles: Map[String, String] = Map(
    "q_asof_join" -> """
      SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
             last_click_id, last_click_ts
      FROM (
        SELECT event_id, user_id, ts, event_type,
               last_value(CASE WHEN event_type = 'click' THEN event_id END
                 IGNORE NULLS) OVER w AS last_click_id,
               last_value(CASE WHEN event_type = 'click' THEN ts END
                 IGNORE NULLS) OVER w AS last_click_ts
        FROM events
        WHERE event_type IN ('click', 'purchase')
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      )
      WHERE event_type = 'purchase'
      ORDER BY purchase_id""",
    "q_asof_join_native" -> """
      WITH clicks AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS click_ts,
               max(event_id) AS click_id
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, CAST(ts AS TIMESTAMP)
      ),
      purchases AS (
        SELECT event_id AS purchase_id, user_id,
               CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'purchase'
      )
      SELECT p.purchase_id, p.user_id, p.ts AS purchase_ts,
             c.click_id, c.click_ts
      FROM purchases p ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND p.ts >= c.click_ts
      ORDER BY purchase_id""",
    "q_range_join" -> """
      SELECT e.event_id AS error_id, count(*) AS n_recent_clicks
      FROM events e JOIN events c
        ON c.event_type = 'click'
       AND epoch_ms(e.ts) - epoch_ms(c.ts) >= 0
       AND epoch_ms(e.ts) - epoch_ms(c.ts) <= 60000
      WHERE e.event_type = 'error'
      GROUP BY e.event_id
      ORDER BY error_id""",
    "q_salted_join" -> s"""
      WITH status_totals AS (
        SELECT o_orderstatus, ${sqlDsum("o_totalprice")} AS status_total
        FROM orders GROUP BY o_orderstatus
      )
      SELECT o.o_orderkey, o.o_orderstatus,
             o.o_totalprice / st.status_total AS share_of_status
      FROM orders o JOIN status_totals st USING (o_orderstatus)
      ORDER BY o_orderkey""")
}
