package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2c rows C1–C8: the scan/project/filter/cast/CTE/join/agg
  * surface the reference delegates to its warehouses (evidence:
  * `/root/reference/projects/adapter/cli_tests/projects/002_jaffle_shop/models/customers.sql`,
  * `integration_tests/projects/simple_project/models/base/` SQL models).
  *
  * Every query ends in an ORDER BY over a unique key so results are
  * row-order deterministic for the hash compare; Catalyst drops the sort
  * when the consumer only counts (Bench), so the sort is free there.
  *
  * Scale posture: filters/projections are plain Catalyst expressions so
  * they push into the parquet scan; small dims (region/nation/part/
  * supplier) are explicitly broadcast in joins; the big-fact aggregations
  * rely on Spark's partial (map-side) aggregation, so the shuffle carries
  * pre-aggregated rows only.
  */
object Relational extends QueryPack {

  /** C1 — full scan / SELECT * passthrough (ref: lib.py:262 fetch). */
  def c1Scan(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "region").orderBy("r_regionkey")

  /** C2 — projection + aliasing + literals (ref: model_a.sql). */
  def c2Project(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(
        col("p_partkey"),
        col("p_name").as("part_name"),
        lit("some text").as("my_text"),
        col("p_retailprice"),
        (col("p_retailprice") * lit(0.9)).as("discounted"))
      .orderBy("p_partkey")

  /** C3 — filter / predicates (ref: forecast_filter.sql). Predicates push
    * down to the parquet scan (PushedFilters).
    */
  def c3Filter(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_quantity") < 24 &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_extendedprice")
      // the synthetic lineitem has duplicate (orderkey, linenumber)
      // pairs, so the full output row is the sort key: tied rows are
      // then interchangeable and the order is engine-independent
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_extendedprice")

  /** C4 — CAST / type conversion (ref: model_b.sql `cast(1 as integer)`,
    * model_d.sql `cast('2022-05-11' as date)`). Note: double→int casts are
    * avoided (Spark truncates, DuckDB rounds); `floor` has one semantics.
    */
  def c4Cast(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        col("o_orderkey").cast("string").as("key_str"),
        col("o_orderdate").cast("date").as("order_date"),
        floor(col("o_totalprice")).cast("long").as("price_floor"),
        lit("2022-05-11").cast("date").as("lit_date"),
        lit(1).cast("long").as("lit_int"),
        lit("42").cast("long").as("parsed_int"))
      .orderBy("o_orderkey")

  /** C5 — CTEs / subqueries (ref: customers.sql, 5 CTEs). Uses the SQL
    * surface directly — the reference compiles Jinja SQL and ships it
    * (lib.py:177-227); here Catalyst inlines the CTEs.
    */
  def c5Cte(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(s"""
      WITH customer_orders AS (
        SELECT o_custkey,
               min(o_orderdate) AS first_order,
               max(o_orderdate) AS most_recent_order,
               count(o_orderkey) AS number_of_orders
        FROM orders GROUP BY o_custkey
      ),
      customer_payments AS (
        SELECT o_custkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS total_amount
        FROM orders GROUP BY o_custkey
      )
      SELECT c.c_custkey, c.c_name,
             co.first_order, co.most_recent_order,
             co.number_of_orders, cp.total_amount
      FROM customer c
      LEFT JOIN customer_orders co ON c.c_custkey = co.o_custkey
      LEFT JOIN customer_payments cp ON c.c_custkey = cp.o_custkey
      ORDER BY c.c_custkey
    """)
  }

  /** C5 — recursive CTE: the dbt_utils date-spine pattern (a generated
    * calendar left-joined to daily order counts, zero-filled gaps).
    * Spark 4 executes WITH RECURSIVE natively (iterative union under
    * the default 100-level limit); DuckDB replays the same recursion.
    * The stop date rides in the recursion state — a bound written as a
    * subquery would re-scan orders on every iteration (measured 16 s at
    * sf0.1 vs ~2 s with the bound carried).
    */
  def c5DateSpine(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(s"""
      WITH RECURSIVE spine(day, stop) AS (
        SELECT CAST(min(o_orderdate) AS DATE),
               date_add(CAST(min(o_orderdate) AS DATE), 29)
        FROM orders
        UNION ALL
        SELECT date_add(day, 1), stop FROM spine WHERE day < stop
      )
      SELECT s.day, count(o.o_orderkey) AS n_orders
      FROM spine s
      LEFT JOIN orders o ON CAST(o.o_orderdate AS DATE) = s.day
      GROUP BY s.day ORDER BY s.day
    """)
  }

  /** C7 — correlated subqueries: EXISTS / NOT EXISTS semi-join forms
    * plus a correlated scalar count (Catalyst decorrelates all three
    * into joins — the declarative way to get the semi/anti plans of
    * c7_join_semi/anti from SQL).
    */
  def c7Exists(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(s"""
      SELECT c.c_custkey, c.c_name,
             (SELECT count(*) FROM orders WHERE o_custkey = c.c_custkey)
               AS n_orders
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c.c_custkey
                      AND o_totalprice > 100000)
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c.c_custkey
                          AND o_orderstatus = 'F'
                          AND o_totalprice < 10000)
      ORDER BY c.c_custkey
    """)
  }

  /** C7 — LATERAL correlated join: top-2 orders per customer through a
    * correlated subquery with LIMIT (the "top-N per group as a join"
    * shape). Catalyst decorrelates the lateral into a ranked window
    * join — same plan the hand-written window form produces, from
    * declarative SQL.
    */
  def c7Lateral(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(s"""
      SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      FROM customer c, LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
    """)
  }

  /** C6 — left equi-join + per-customer rollup: the jaffle `customers.sql`
    * shape (min/max/count/sum per customer) on the testdata. This is the
    * flagship `SparkEntry.entry` query (SURVEY.md §7 step 1).
    */
  def c6JoinLeft(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(c("c_custkey"), c("c_name"))
      .agg(
        min(col("o_orderdate")).as("first_order"),
        max(col("o_orderdate")).as("most_recent_order"),
        count(col("o_orderkey")).as("number_of_orders"),
        dsum(col("o_totalprice")).as("customer_lifetime_value"))
      .orderBy("c_custkey")
  }

  /** C7 — inner join across fact + two broadcast dims (part, supplier are
    * small: Catalyst would broadcast them under AQE anyway; the hint makes
    * the plan stable at any scale factor).
    */
  def c7JoinInner(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem")
    val p = t(spark, dir, "part")
    val s = t(spark, dir, "supplier")
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey"))
      .filter(p("p_size") < 10)
      .select(l("l_orderkey"), l("l_linenumber"), p("p_name"),
        p("p_size"), s("s_name"), l("l_quantity"))
      // full-row sort key: duplicate (orderkey, linenumber) pairs exist
      .orderBy("l_orderkey", "l_linenumber", "p_name", "p_size",
        "s_name", "l_quantity")
  }

  /** C7 — left-semi: customers having at least one order (EXISTS). */
  def c7JoinSemi(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** C7 — left-anti: customers with no 2001 orders (the shape dbt
    * relationship tests compile to; SURVEY.md C22 evidence). The filter on
    * the right side is pushed below the join into the parquet scan.
    */
  def c7JoinAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** C7 — theta join: equi key plus a range predicate (ship after order
    * date +30d). The equi component keeps it a hash join; the range is a
    * post-join filter, not a nested-loop.
    */
  def c7JoinTheta(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    l.join(o, l("l_orderkey") === o("o_orderkey") &&
        l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .select(l("l_orderkey"), l("l_linenumber"), o("o_orderdate"),
        l("l_shipdate"))
      // full-row sort key: duplicate (orderkey, linenumber) pairs exist
      .orderBy("l_orderkey", "l_linenumber", "l_shipdate")
  }

  /** C8 — the aggregation matrix (TPC-H Q1 shape; ref evidence
    * customers.sql:19-45 min/max/count/sum). Map-side partial agg means
    * the shuffle moves ~|groups| rows per partition, not |lineitem|.
    */
  def c8Agg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c1_scan" -> c1Scan _,
    "c2_project" -> c2Project _,
    "c3_filter" -> c3Filter _,
    "c4_cast" -> c4Cast _,
    "c5_cte" -> c5Cte _,
    "c5_date_spine" -> c5DateSpine _,
    "c6_join_left" -> c6JoinLeft _,
    "c7_exists" -> c7Exists _,
    "c7_lateral" -> c7Lateral _,
    "c7_join_inner" -> c7JoinInner _,
    "c7_join_semi" -> c7JoinSemi _,
    "c7_join_anti" -> c7JoinAnti _,
    "c7_join_theta" -> c7JoinTheta _,
    "c8_agg" -> c8Agg _)

  val oracles: Map[String, String] = Map(
    "c1_scan" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "c2_project" -> """
      SELECT p_partkey, p_name AS part_name, 'some text' AS my_text,
             p_retailprice,
             p_retailprice * CAST(0.9 AS DOUBLE) AS discounted
      FROM part ORDER BY p_partkey""",
    "c3_filter" -> """
      SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
             l_extendedprice
      FROM lineitem
      WHERE l_quantity < 24
        AND l_discount >= CAST(0.05 AS DOUBLE)
        AND l_discount <= CAST(0.07 AS DOUBLE)
      ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount,
        l_extendedprice""",
    "c4_cast" -> """
      SELECT o_orderkey,
             CAST(o_orderkey AS VARCHAR) AS key_str,
             CAST(o_orderdate AS DATE) AS order_date,
             CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
             CAST('2022-05-11' AS DATE) AS lit_date,
             CAST(1 AS BIGINT) AS lit_int,
             CAST('42' AS BIGINT) AS parsed_int
      FROM orders ORDER BY o_orderkey""",
    "c5_cte" -> """
      WITH customer_orders AS (
        SELECT o_custkey,
               min(o_orderdate) AS first_order,
               max(o_orderdate) AS most_recent_order,
               count(o_orderkey) AS number_of_orders
        FROM orders GROUP BY o_custkey
      ),
      customer_payments AS (
        SELECT o_custkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS total_amount
        FROM orders GROUP BY o_custkey
      )
      SELECT c.c_custkey, c.c_name,
             co.first_order, co.most_recent_order,
             co.number_of_orders, cp.total_amount
      FROM customer c
      LEFT JOIN customer_orders co ON c.c_custkey = co.o_custkey
      LEFT JOIN customer_payments cp ON c.c_custkey = cp.o_custkey
      ORDER BY c.c_custkey""",
    "c5_date_spine" -> """
      WITH RECURSIVE spine(day, stop) AS (
        SELECT CAST(min(o_orderdate) AS DATE),
               CAST(min(o_orderdate) AS DATE) + 29
        FROM orders
        UNION ALL
        SELECT day + 1, stop FROM spine WHERE day < stop
      )
      SELECT s.day, count(o.o_orderkey) AS n_orders
      FROM spine s
      LEFT JOIN orders o ON CAST(o.o_orderdate AS DATE) = s.day
      GROUP BY s.day ORDER BY s.day""",
    "c7_exists" -> """
      SELECT c.c_custkey, c.c_name,
             (SELECT count(*) FROM orders WHERE o_custkey = c.c_custkey)
               AS n_orders
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c.c_custkey
                      AND o_totalprice > 100000)
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c.c_custkey
                          AND o_orderstatus = 'F'
                          AND o_totalprice < 10000)
      ORDER BY c.c_custkey""",
    "c7_lateral" -> """
      SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      FROM customer c, LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""",
    "c6_join_left" -> s"""
      SELECT c_custkey, c_name,
             min(o_orderdate) AS first_order,
             max(o_orderdate) AS most_recent_order,
             count(o_orderkey) AS number_of_orders,
             ${sqlDsum("o_totalprice")} AS customer_lifetime_value
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_name
      ORDER BY c_custkey""",
    "c7_join_inner" -> """
      SELECT l_orderkey, l_linenumber, p_name, p_size, s_name, l_quantity
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE p_size < 10
      ORDER BY l_orderkey, l_linenumber, p_name, p_size, s_name,
        l_quantity""",
    "c7_join_semi" -> """
      SELECT c_custkey, c_name FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      ORDER BY c_custkey""",
    "c7_join_anti" -> """
      SELECT c_custkey, c_name FROM customer c
      WHERE NOT EXISTS
        (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
      ORDER BY c_custkey""",
    "c7_join_theta" -> """
      SELECT l_orderkey, l_linenumber, o_orderdate, l_shipdate
      FROM lineitem JOIN orders
        ON l_orderkey = o_orderkey
       AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      ORDER BY l_orderkey, l_linenumber, l_shipdate""",
    "c8_agg" -> s"""
      SELECT l_returnflag, l_linestatus,
             ${sqlDsum("l_quantity")} AS sum_qty,
             ${sqlDsum("l_extendedprice")} AS sum_base_price,
             ${sqlDsum("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)")}
               AS sum_disc_price,
             ${sqlDavg("l_quantity")} AS avg_qty,
             ${sqlDavg("l_discount")} AS avg_disc,
             min(l_quantity) AS min_qty,
             max(l_quantity) AS max_qty,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")
}
