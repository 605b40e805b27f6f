package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-4 relational completions: full-outer join, null-handling
  * surface, least-squares regression aggregates, and positional
  * arg-min/arg-max — the remaining delegated-surface cells of
  * SURVEY.md C7/C8 (the reference's warehouses all expose these; its
  * pandas scripts use `fillna`/`idxmax` for the same semantics,
  * `005/fal_scripts/complete_model.py:11-14`).
  */
object Relational4 extends QueryPack {

  private def d(c: Column): Column = c.cast("double")

  /** C7 (completion) — full outer join: high-balance customers against
    * per-customer order rollups; either side can be absent (customers
    * with no orders, orders whose customer misses the balance filter).
    *
    * Scale: both sides shuffle on the key once (the rollup's
    * aggregation shuffle doubles as the join shuffle — same key, so
    * the exchange is reused); no broadcast since neither side of a
    * full-outer can stream against a hash table without losing
    * unmatched build rows.
    */
  def c7JoinFull(spark: SparkSession, dir: String): DataFrame = {
    val perCust = t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("spend"))
    val rich = t(spark, dir, "customer")
      .filter(col("c_acctbal") > 9000.0)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    rich.join(perCust, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_name"),
        col("c_acctbal"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        col("spend"))
      .orderBy("custkey")
  }

  /** C2/C4 (completion) — the null-handling surface: NULLIF to
    * introduce nulls, COALESCE/IFNULL to repair them, null-aware
    * counts, and NULL-safe equality (`<=>` / IS NOT DISTINCT FROM).
    */
  def c24Nulls(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .withColumn("pri", nullif(col("o_orderpriority"), lit("1-URGENT")))
      .withColumn("cust7",
        when(col("o_orderkey") % 7 === 0, col("o_custkey")))
    o.groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("pri")).as("n_pri_nonnull"),
        sum(col("pri").isNull.cast("long")).as("n_pri_null"),
        countDistinct(coalesce(col("pri"), lit("URGENT"))).as("n_pri_filled"),
        sum((col("pri") <=> col("o_orderpriority")).cast("long"))
          .as("n_pri_same"),
        count(col("cust7")).as("n_cust7"))
      .orderBy("o_orderstatus")
  }

  /** C8 (completion) — simple least squares per group from sufficient
    * statistics (regr_slope / regr_intercept / r² of price on
    * quantity): one partial-aggregable pass, the distributed shape of
    * every sketchable regression. Rounded at 6 — see qStatsCorr on the
    * int128→double divergence in the last ulp.
    */
  def qRegression(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    li.groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sx"),
        dsum(col("l_extendedprice")).as("sy"),
        dsum(col("l_quantity") * col("l_quantity")).as("sxx"),
        dsum(col("l_extendedprice") * col("l_extendedprice")).as("syy"),
        dsum(col("l_quantity") * col("l_extendedprice")).as("sxy"))
      .select(
        col("l_returnflag"), col("n"),
        round(olsSlope(col("n"), col("sx"), col("sy"), col("sxx"),
          col("sxy")), 6).as("slope"),
        round(olsIntercept(col("n"), col("sx"), col("sy"), col("sxx"),
          col("sxy")), 6).as("intercept"),
        round(
          ((d(col("n")) * col("sxy") - col("sx") * col("sy")) *
            (d(col("n")) * col("sxy") - col("sx") * col("sy"))) /
            ((d(col("n")) * col("sxx") - col("sx") * col("sx")) *
              (d(col("n")) * col("syy") - col("sy") * col("sy"))), 6)
          .as("r2"))
      .orderBy("l_returnflag")
  }

  /** C8 (completion) — arg-min/arg-max (min_by/max_by; DuckDB
    * arg_min/arg_max): the value of one column at another column's
    * extreme. Keyed on the unique o_orderkey so the argmax is
    * deterministic in both engines.
    */
  def qArgminmax(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        max_by(col("o_orderpriority"), col("o_orderkey"))
          .as("last_priority"),
        min_by(col("o_orderpriority"), col("o_orderkey"))
          .as("first_priority"),
        max_by(col("o_totalprice"), col("o_orderkey")).as("last_price"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy("o_orderstatus")
  }

  /** C12/C16 (completion) — gap-fill with last-observation-carried-
    * forward: a 60-day spine left-joined to the sparse URGENT-only
    * daily revenue series, missing days filled by the latest prior
    * observation (`last(..., ignoreNulls)` over a running frame —
    * DuckDB's `last_value(x IGNORE NULLS)`). The standard
    * time-series repair before resampling/feature extraction.
    *
    * Scale: the spine generates from one broadcast scalar; the join
    * shuffles only the daily aggregate (≤ one row per day); the LOCF
    * window orders the tiny day series. For multi-entity series the
    * window gains a partitionBy(entity) and stays bounded per key.
    */
  def qLocf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = t(spark, dir, "orders")
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(dsum(col("o_totalprice")).as("revenue"))
    val bounds = broadcast(
      o.agg(min(col("o_orderdate").cast("date")).as("d0")))
    val spine = bounds
      .select(explode(sequence(col("d0"), date_add(col("d0"), 59))).as("d"))
    val w = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(urgent, Seq("d"), "left")
      .select(col("d"), col("revenue"),
        last(col("revenue"), ignoreNulls = true).over(w)
          .as("revenue_filled"),
        col("revenue").isNull.as("is_gap"))
      .orderBy("d")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_locf" -> qLocf _,
    "c7_join_full" -> c7JoinFull _,
    "c24_nulls" -> c24Nulls _,
    "q_regression" -> qRegression _,
    "q_argminmax" -> qArgminmax _)

  val oracles: Map[String, String] = Map(
    "q_locf" -> s"""
      WITH RECURSIVE urgent AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               ${sqlDsum("o_totalprice")} AS revenue
        FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1
      ),
      spine(d, stop) AS (
        SELECT CAST(min(o_orderdate) AS DATE),
               CAST(min(o_orderdate) AS DATE) + 59
        FROM orders
        UNION ALL
        SELECT d + 1, stop FROM spine WHERE d < stop
      )
      SELECT s.d, u.revenue,
             last_value(u.revenue IGNORE NULLS) OVER
               (ORDER BY s.d ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS revenue_filled,
             (u.revenue IS NULL) AS is_gap
      FROM spine s LEFT JOIN urgent u ON s.d = u.d
      ORDER BY s.d""",
    "c7_join_full" -> s"""
      WITH per_cust AS (
        SELECT o_custkey, count(*) AS n_orders,
               ${sqlDsum("o_totalprice")} AS spend
        FROM orders GROUP BY o_custkey
      ),
      rich AS (
        SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE c_acctbal > 9000.0
      )
      SELECT COALESCE(c_custkey, o_custkey) AS custkey, c_name, c_acctbal,
             COALESCE(n_orders, 0) AS n_orders, spend
      FROM rich FULL OUTER JOIN per_cust ON c_custkey = o_custkey
      ORDER BY custkey""",
    "c24_nulls" -> """
      WITH o AS (
        SELECT o_orderstatus, o_orderpriority,
               nullif(o_orderpriority, '1-URGENT') AS pri,
               CASE WHEN o_orderkey % 7 = 0 THEN o_custkey END AS cust7
        FROM orders
      )
      SELECT o_orderstatus,
             count(*) AS n_rows,
             count(pri) AS n_pri_nonnull,
             CAST(sum(CASE WHEN pri IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pri_null,
             count(DISTINCT coalesce(pri, 'URGENT')) AS n_pri_filled,
             CAST(sum(CASE WHEN pri IS NOT DISTINCT FROM o_orderpriority
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_pri_same,
             count(cust7) AS n_cust7
      FROM o GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_regression" -> s"""
      WITH s AS (
        SELECT l_returnflag, count(*) AS n,
               ${sqlDsum("l_quantity")} AS sx,
               ${sqlDsum("l_extendedprice")} AS sy,
               ${sqlDsum("l_quantity * l_quantity")} AS sxx,
               ${sqlDsum("l_extendedprice * l_extendedprice")} AS syy,
               ${sqlDsum("l_quantity * l_extendedprice")} AS sxy
        FROM lineitem GROUP BY l_returnflag
      )
      SELECT l_returnflag, n,
             round(${sqlOlsSlope("n", "sx", "sy", "sxx", "sxy")}, 6)
               AS slope,
             round(${sqlOlsIntercept("n", "sx", "sy", "sxx", "sxy")}, 6)
               AS intercept,
             round(((CAST(n AS DOUBLE) * sxy - sx * sy) *
                    (CAST(n AS DOUBLE) * sxy - sx * sy)) /
                   ((CAST(n AS DOUBLE) * sxx - sx * sx) *
                    (CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS r2
      FROM s ORDER BY l_returnflag""",
    "q_argminmax" -> """
      SELECT o_orderstatus,
             arg_max(o_orderpriority, o_orderkey) AS last_priority,
             arg_min(o_orderpriority, o_orderkey) AS first_priority,
             arg_max(o_totalprice, o_orderkey) AS last_price,
             max(o_orderkey) AS max_key
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")
}
