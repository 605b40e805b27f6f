package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 event-stream additions: interval-concurrency sweep (the
  * classic +1/−1 endpoint scan, distributed) and batch CDC apply
  * (latest-change-wins upsert/delete merge — the set-based form of the
  * reference's incremental strategies, `A/dbt/fal/adapters/python/
  * impl.py:256-291`, whose `merge` the warehouses execute for it).
  */
object EventWindows2 extends QueryPack {

  /** E1/E2 (completion) — max concurrency per event type: treat every
    * event as a 60-second interval [ts, ts+60s), sweep +1/−1 endpoint
    * deltas in time order, and report each type's peak concurrent
    * interval count with the earliest instant it is reached.
    *
    * Scale: the running sum is NOT a per-type global window (one
    * partition per type = a hotspot at 100 TB). Net the deltas per
    * (type, instant), then [[withRunningSums]] keyed by type — one
    * balanced range shuffle + broadcast per-partition offsets. (An
    * earlier hand-rolled variant bucketed by (type, hour); instants
    * per hour grow with traffic, where the range partitioner stays
    * balanced by construction.) Endpoint merging per instant is
    * exact for the peak: a −1 and +1 at the same instant net to zero,
    * matching the half-open-interval convention (an interval ending at
    * t does not overlap one starting at t).
    */
  def e7Concurrency(spark: SparkSession, dir: String): DataFrame = {
    // ONE scan of the event table: each row explodes into its +1/−1
    // endpoint pair in-row (the unionAll form read the parquet twice —
    // 2× the scan IO at 100 TB for zero benefit)
    val endpoints = t(spark, dir, "events")
      .select(col("event_type"), explode(array(
        struct(col("ts").as("t"), lit(1L).as("delta")),
        struct((col("ts") + expr("INTERVAL 60 SECONDS")).as("t"),
          lit(-1L).as("delta")))).as("e"))
      .select(col("event_type"), col("e.t").as("t"),
        col("e.delta").as("delta"))
    val net = endpoints.groupBy("event_type", "t")
      .agg(sum(col("delta")).as("d"))
    val loads = withRunningSums(net, "event_type", "t", "__rn", "__n",
      Seq("load" -> "d"))
    // ONE aggregation finds both the peak and its earliest instant:
    // max of (load, −micros(t)) is the argmax pair. The former
    // peaks-then-join-back shape consumed `loads` twice, and each
    // consumer re-ran the whole prefix-sum window pass over the cached
    // range layout (opt guide §1.2 — don't compute things twice;
    // measured 1.8 s → ~1.1 s steady at sf0.1). unix_micros /
    // timestamp_micros round-trip is exact, so at_ts is bit-identical
    // to the min(t)-at-max form the oracle keeps.
    loads.groupBy("event_type")
      .agg(max(struct(col("load"),
        (-unix_micros(col("t"))).as("__nt"))).as("__p"))
      .select(col("event_type"),
        col("__p.load").as("max_concurrent"),
        timestamp_micros(-col("__p.__nt")).as("at_ts"))
      .orderBy("event_type")
  }

  /** C20 (completion) — batch CDC apply: the change stream is each
    * user's LATEST event (row_number over (ts, event_id) desc);
    * `error` means delete, anything else upserts the event's value as
    * the new balance. Applied against the sub-100 customer slice so
    * all three paths occur: updates (key in base), inserts (key not in
    * base), deletes (error-latest keys vanish), plus untouched base
    * rows (`keep`).
    *
    * Scale: the latest-change reduction is a keyed window (shards by
    * user); the apply is one full-outer join on the key — exactly the
    * MERGE plan a warehouse would run, with no driver-side state.
    */
  def e8Cdc(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "customer")
      .filter(col("c_custkey") < 100)
      .select(col("c_custkey").as("key"), col("c_name"),
        col("c_acctbal"))
    val wLatest = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val latest = t(spark, dir, "events")
      .withColumn("rn", row_number().over(wLatest))
      .filter(col("rn") === 1)
      .select(col("user_id").as("key"), col("event_type"),
        col("value").as("new_bal"))
    base.join(latest, Seq("key"), "full_outer")
      .filter(!(col("event_type") === "error")
        || col("event_type").isNull)
      .select(col("key"), col("c_name"),
        when(col("event_type").isNull, col("c_acctbal"))
          .otherwise(col("new_bal")).as("balance"),
        when(col("event_type").isNull, "keep")
          .when(col("c_name").isNull, "insert")
          .otherwise("update").as("op"))
      .orderBy("key")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e7_concurrency" -> e7Concurrency _,
    "e8_cdc" -> e8Cdc _)

  val oracles: Map[String, String] = Map(
    "e7_concurrency" -> """
      WITH ep AS (
        SELECT event_type, ts AS t, 1 AS delta FROM events
        UNION ALL
        SELECT event_type, ts + INTERVAL 60 SECOND, -1 FROM events
      ),
      net AS (
        SELECT event_type, t, CAST(sum(delta) AS BIGINT) AS d
        FROM ep GROUP BY event_type, t
      ),
      loads AS (
        SELECT event_type, t,
               CAST(sum(d) OVER (PARTITION BY event_type ORDER BY t)
                 AS BIGINT) AS load
        FROM net
      ),
      mx AS (
        SELECT event_type, max(load) AS max_concurrent FROM loads
        GROUP BY event_type
      )
      SELECT l.event_type, m.max_concurrent, min(l.t) AS at_ts
      FROM loads l JOIN mx m
        ON l.event_type = m.event_type AND l.load = m.max_concurrent
      GROUP BY l.event_type, m.max_concurrent
      ORDER BY l.event_type""",
    "e8_cdc" -> """
      WITH base AS (
        SELECT c_custkey AS key, c_name, c_acctbal FROM customer
        WHERE c_custkey < 100
      ),
      latest AS (
        SELECT user_id AS key, event_type, value AS new_bal
        FROM (
          SELECT user_id, event_type, value,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
          FROM events
        ) WHERE rn = 1
      )
      SELECT COALESCE(b.key, l.key) AS key, b.c_name,
             CASE WHEN l.event_type IS NULL THEN b.c_acctbal
                  ELSE l.new_bal END AS balance,
             CASE WHEN l.event_type IS NULL THEN 'keep'
                  WHEN b.c_name IS NULL THEN 'insert'
                  ELSE 'update' END AS op
      FROM base b FULL OUTER JOIN latest l ON b.key = l.key
      WHERE l.event_type IS NULL OR l.event_type <> 'error'
      ORDER BY key""")
}
