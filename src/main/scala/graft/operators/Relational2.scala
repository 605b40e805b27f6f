package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2c rows C9–C22: distinct, pivot, rollup/cube/grouping sets,
  * windows, top-k, set ops, function packs, incremental merge, ephemeral
  * chains, and dbt-style data tests.
  *
  * Scale notes per operator are on each method; the shared rules:
  * group-bys rely on partial aggregation, count-distinct on big keys
  * offers `approx_count_distinct` (C9), window functions partition on the
  * natural key so state stays bounded per partition, and top-k compiles to
  * TakeOrderedAndProject (no full sort at scale).
  */
object Relational2 extends QueryPack {

  /** C9 — distinct (dup-elimination shuffles once on the projected key). */
  def c9Distinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select("o_orderstatus", "o_orderpriority")
      .distinct()
      .orderBy("o_orderstatus", "o_orderpriority")

  /** C9 — count-distinct per group (exact; expands then re-aggregates). */
  def c9CountDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("distinct_parts"),
        countDistinct(col("l_suppkey")).as("distinct_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** C9 — approx distinct via HLL sketch: the 100 TB path, one pass, no
    * expand. HLL internals aren't SQL-portable, so the exported check is
    * the sketch's CONTRACT: the approx count must land within 5% of the
    * exact count (rsd is configured at 1%). The oracle emits the exact
    * count plus `within_5pct = true`, so a drifting sketch hash-fails.
    */
  def c9ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), 0.01).as("approx"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx") - col("exact_parts")).cast("double") /
          col("exact_parts").cast("double") <= 0.05).as("within_5pct"))
      .orderBy("l_returnflag")

  /** C10 — CASE-WHEN pivot (the `orders.sql:19-22` payment-method shape). */
  def c10PivotCase(spark: SparkSession, dir: String): DataFrame = {
    def bucket(p: String) =
      sum(when(col("o_orderpriority") === p, col("o_totalprice"))
        .otherwise(lit(0.0)).cast("decimal(18,4)")).cast("double")
    t(spark, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        bucket("1-URGENT").as("urgent_amount"),
        bucket("2-HIGH").as("high_amount"),
        bucket("3-MEDIUM").as("medium_amount"),
        bucket("5-LOW").as("low_amount"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")
  }

  /** C10 — relational pivot with an explicit value list (explicit values
    * keep the plan one-pass; without them Spark first scans for distinct
    * pivot keys).
    */
  def c10Pivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy("o_orderstatus")
      .pivot("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM"))
      .agg(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double"))
      .withColumnRenamed("1-URGENT", "urgent_amount")
      .withColumnRenamed("2-HIGH", "high_amount")
      .withColumnRenamed("3-MEDIUM", "medium_amount")
      .orderBy("o_orderstatus")

  /** C10 — unpivot/melt (the pivot inverse): wide metric columns to
    * (key, metric, value) rows — the shape feature pipelines use to
    * normalize heterogeneous per-entity metrics. Pure row-local
    * Generate, no shuffle.
    */
  def c10Unpivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(col("p_partkey"), col("p_retailprice"),
        col("p_size").cast("double").as("p_size"))
      .unpivot(Array(col("p_partkey")),
        Array(col("p_retailprice"), col("p_size")), "metric", "value")
      .orderBy("p_partkey", "metric")

  /** C11 — rollup with grouping id (subtotal rows keyed by gid). */
  def c11Rollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        grouping_id().cast("long").as("gid"),
        dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("gid"), col("sum_qty"), col("n_rows"))
      .orderBy("gid", "returnflag", "linestatus")

  /** C11 — cube (all 4 grouping combinations). */
  def c11Cube(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(
        grouping_id().cast("long").as("gid"),
        dsum(col("o_totalprice")).as("total_price"),
        count(lit(1)).as("n_orders"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("gid"), col("total_price"), col("n_orders"))
      .orderBy("gid", "status", "priority")

  /** C11 — explicit GROUPING SETS through the SQL surface. */
  def c11GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(s"""
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             CAST(grouping(o_orderstatus)*2 + grouping(o_orderpriority)
               AS BIGINT) AS gid,
             ${sqlDsum("o_totalprice")} AS total_price,
             count(*) AS n_orders
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY gid, status, priority
    """)
  }

  /** C12 — ranking + analytic window functions. Partitioned by customer so
    * per-partition state is small and the sort is local after one shuffle.
    */
  def c12WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val byPrice = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val byDate = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(spark, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(byPrice).cast("long").as("price_rank"),
        rank().over(byPrice).cast("long").as("price_rank_ties"),
        dense_rank().over(byPrice).cast("long").as("price_dense_rank"),
        lag(col("o_totalprice"), 1).over(byDate).as("prev_price"),
        lead(col("o_totalprice"), 1).over(byDate).as("next_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** C12 — frame-based windows: running total + moving average (decimal
    * inside the frame for cross-engine exactness; DuckDB's segment-tree
    * sliding aggregation reassociates double adds, decimals are immune).
    */
  def c12WindowFrames(spark: SparkSession, dir: String): DataFrame = {
    // l_quantity tie-break: the synthetic lineitem contains duplicate
    // (suppkey, shipdate, orderkey, linenumber) rows differing only in
    // quantity, so without it neither the window order nor the output
    // order is total and the running sums are tie-dependent. Rows equal
    // on all five keys are interchangeable for every emitted column.
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val moving = w.rowsBetween(-3, Window.currentRow)
    t(spark, dir, "lineitem")
      .select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"),
        sum(col("l_quantity").cast("decimal(18,4)")).over(running)
          .cast("double").as("running_qty"),
        (sum(col("l_quantity").cast("decimal(18,4)")).over(moving)
          .cast("double") /
          count(lit(1)).over(moving).cast("double")).as("moving_avg_qty"))
      .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber",
        "l_quantity")
  }

  /** C12 — analytic value functions: ntile bucketing plus
    * first/last/nth over the full-partition frame (explicit frame —
    * the default RANGE..CURRENT frame makes last_value a footgun in
    * every engine). Deterministic via the unique (date, orderkey)
    * ordering.
    */
  def c12WindowAnalytics(spark: SparkSession, dir: String): DataFrame = {
    val byDate = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val full = byDate.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    t(spark, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        ntile(4).over(byDate).cast("long").as("quartile"),
        first(col("o_totalprice")).over(full).as("first_price"),
        last(col("o_totalprice")).over(full).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(full).as("second_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** C13 — top-k: compiles to TakeOrderedAndProject — each partition keeps
    * a k-row heap, the driver merges k·partitions rows, never a full sort.
    */
  def c13TopK(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"))
      .limit(100)

  /** C14 — set operations, tagged into one result. */
  def c14SetOps(spark: SparkSession, dir: String): DataFrame = {
    val a = t(spark, dir, "customer")
      .filter(col("c_acctbal") > 5000)
      .select(col("c_nationkey").cast("long").as("k"))
    val b = t(spark, dir, "supplier")
      .select(col("s_nationkey").cast("long").as("k"))
    val union = a.union(b).distinct().withColumn("op", lit("union"))
    val inter = a.intersect(b).withColumn("op", lit("intersect"))
    val except = a.except(b).withColumn("op", lit("except"))
    union.unionByName(inter).unionByName(except)
      .select("op", "k")
      .orderBy("op", "k")
  }

  /** C15 — string function pack (ref evidence: `complete_model.py` lower,
    * concatenations in scripts).
    */
  def c15Strings(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(
        col("p_partkey"),
        lower(col("p_type")).as("type_lc"),
        upper(col("p_name")).as("name_uc"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
        substring(col("p_name"), 1, 5).as("name_prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        trim(col("p_name")).as("name_trim"),
        regexp_replace(col("p_type"), " ", "_").as("type_snake"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_token"),
        lpad(col("p_brand"), 12, "*").as("brand_padded"),
        col("p_name").contains("green").as("is_green"),
        instr(col("p_name"), "o").cast("long").as("first_o"))
      .orderBy("p_partkey")

  /** C16 — date/time pack (ref: model_with_date.py round-trips). */
  def c16Dates(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"),
        dayofmonth(col("o_orderdate")).cast("long").as("o_day"),
        (weekday(col("o_orderdate")) + 1).cast("long").as("o_isodow"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        col("o_orderdate").cast("date").as("o_date"),
        add_months(col("o_orderdate").cast("date"), 1).as("next_month"),
        datediff(lit("2002-01-01").cast("date"),
          col("o_orderdate").cast("date")).cast("long").as("days_to_2002"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("date_str"))
      .orderBy("o_orderkey")

  /** C17 — math pack, restricted to operations with identical IEEE
    * behavior in both engines (sqrt is correctly-rounded; transcendental
    * libm functions are not and would differ in the last ulp).
    */
  def c17Math(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(
        col("p_partkey"),
        abs(col("p_retailprice") - 1000.0).as("abs_delta"),
        round(col("p_retailprice").cast("decimal(18,4)"), 2).cast("double")
          .as("price_rounded"),
        sqrt(col("p_retailprice")).as("price_sqrt"),
        (col("p_retailprice") * col("p_retailprice")).as("price_sq"),
        (col("p_partkey") % 7).cast("long").as("key_mod7"),
        signum(col("p_retailprice") - 1000.0).as("delta_sign"),
        ceil(col("p_retailprice")).cast("long").as("price_ceil"),
        floor(col("p_retailprice")).cast("long").as("price_floor"),
        greatest(col("p_retailprice"), lit(500.0)).as("price_floor500"),
        least(col("p_size").cast("long"), lit(25L)).as("size_cap25"))
      .orderBy("p_partkey")

  /** C18 — array pack over higher-order functions (ref:
    * model_with_array.py string[]/int[] round-trips). Array results are
    * serialized with array_join for the export: the driver's compare
    * sorts the pandas frame and raw array cells are unhashable there
    * (round-1 c18_arrays failure); the list ops themselves still run.
    */
  def c18Arrays(spark: SparkSession, dir: String): DataFrame = {
    val words = split(col("p_name"), " ")
    t(spark, dir, "part")
      .select(
        col("p_partkey"),
        array_join(words, "|").as("words"),
        size(words).cast("long").as("n_words"),
        array_contains(words, "green").as("has_green"),
        array_join(transform(words, w => upper(w)), "|").as("words_uc"),
        array_join(filter(words, w => length(w) > 4), "|").as("long_words"),
        array_join(sort_array(words), "|").as("words_sorted"),
        element_at(words, 1).as("first_word"))
      .orderBy("p_partkey")
  }

  /** C18 — explode / UNNEST (the Generator-style UDTF shape, D2). */
  def c18Explode(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(col("p_partkey"), explode(split(col("p_name"), " ")).as("word"))
      .orderBy("p_partkey", "word")

  /** C19 — JSON + struct pack (ref: VARIANT json.loads `lib.py:725-733`,
    * model_c.py json column).
    */
  def c19Json(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"),
        to_json(struct(col("event_type").as("t"),
          col("user_id").as("u"))).as("packed"),
        struct(col("event_type").as("et"), col("value").as("v"))
          .getField("et").as("struct_type"))
      .orderBy("event_id")

  /** C20 — incremental materialization, delete+insert strategy (ref:
    * strategies listed `A/dbt/fal/adapters/python/impl.py:256-291`):
    * rows whose key appears in the increment are replaced, others kept.
    * At scale both sides shuffle on the key once; the anti join is the
    * same hash join the MERGE would be.
    */
  def c20Incremental(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val base = orders
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    // simulated increment: all open ('P') orders arrive re-priced
    val increment = orders
      .filter(col("o_orderstatus") === "P")
      .select(col("o_orderkey"), col("o_custkey"),
        lit("F").as("o_orderstatus"),
        (col("o_totalprice") * 1.1).as("o_totalprice"))
    base.join(increment.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
      .unionByName(increment)
      .orderBy("o_orderkey")
  }

  /** C21 — ephemeral models: a chain of non-materialized CTEs compiled
    * into one plan (ref: generated shims are materialized='ephemeral',
    * model_generator.py:18-30).
    */
  def c21Ephemeral(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(s"""
      WITH stg_orders AS (
        SELECT o_orderkey, o_custkey, o_totalprice,
               CAST(o_orderdate AS DATE) AS order_date
        FROM orders
      ),
      enriched AS (
        SELECT o.*, c.c_mktsegment
        FROM stg_orders o JOIN customer c ON o.o_custkey = c.c_custkey
      )
      SELECT c_mktsegment,
             count(*) AS n_orders,
             ${sqlDsum("o_totalprice")} AS segment_revenue
      FROM enriched
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment
    """)
  }

  /** C22 — dbt-style data tests as one violations summary (not_null,
    * unique, relationships, singular; ref: schema.yml tests +
    * customer_lifetime_value.sql singular test). All four are assertion
    * aggregates; at scale each is one shuffle (or none for not_null).
    */
  def c22Tests(spark: SparkSession, dir: String): DataFrame = {
    val customer = t(spark, dir, "customer")
    val orders = t(spark, dir, "orders")
    val lineitem = t(spark, dir, "lineitem")
    def one(name: String, violations: DataFrame) =
      violations.agg(count(lit(1)).cast("long").as("violations"))
        .withColumn("test", lit(name))
    val notNull = one("not_null_customer_custkey",
      customer.filter(col("c_custkey").isNull))
    val unique = one("unique_orders_orderkey",
      orders.groupBy("o_orderkey").agg(count(lit(1)).as("n"))
        .filter(col("n") > 1))
    val rel = one("relationships_lineitem_orders",
      lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey"),
        "left_anti"))
    val singular = one("singular_nonnegative_clv",
      orders.groupBy("o_custkey")
        .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("clv"))
        .filter(col("clv") < 0))
    notNull.unionByName(unique).unionByName(rel).unionByName(singular)
      .select("test", "violations")
      .orderBy("test")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c9_distinct" -> c9Distinct _,
    "c9_count_distinct" -> c9CountDistinct _,
    "c9_approx_distinct" -> c9ApproxDistinct _,
    "c10_pivot_case" -> c10PivotCase _,
    "c10_pivot" -> c10Pivot _,
    "c11_rollup" -> c11Rollup _,
    "c11_cube" -> c11Cube _,
    "c11_grouping_sets" -> c11GroupingSets _,
    "c12_window_rank" -> c12WindowRank _,
    "c12_window_frames" -> c12WindowFrames _,
    "c12_window_analytics" -> c12WindowAnalytics _,
    "c10_unpivot" -> c10Unpivot _,
    "c13_topk" -> c13TopK _,
    "c14_setops" -> c14SetOps _,
    "c15_strings" -> c15Strings _,
    "c16_dates" -> c16Dates _,
    "c17_math" -> c17Math _,
    "c18_arrays" -> c18Arrays _,
    "c18_explode" -> c18Explode _,
    "c19_json" -> c19Json _,
    "c20_incremental" -> c20Incremental _,
    "c21_ephemeral" -> c21Ephemeral _,
    "c22_tests" -> c22Tests _)

  val oracles: Map[String, String] = Map(
    "c9_distinct" -> """
      SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
      ORDER BY o_orderstatus, o_orderpriority""",
    "c9_count_distinct" -> """
      SELECT l_returnflag,
             count(DISTINCT l_partkey) AS distinct_parts,
             count(DISTINCT l_suppkey) AS distinct_supps,
             count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "c9_approx_distinct" -> """
      SELECT l_returnflag,
             count(DISTINCT l_partkey) AS exact_parts,
             true AS within_5pct
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "c10_pivot_case" -> s"""
      SELECT o_orderstatus,
        CAST(sum(CAST(CASE WHEN o_orderpriority = '1-URGENT'
          THEN o_totalprice ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE)
          AS urgent_amount,
        CAST(sum(CAST(CASE WHEN o_orderpriority = '2-HIGH'
          THEN o_totalprice ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE)
          AS high_amount,
        CAST(sum(CAST(CASE WHEN o_orderpriority = '3-MEDIUM'
          THEN o_totalprice ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE)
          AS medium_amount,
        CAST(sum(CAST(CASE WHEN o_orderpriority = '5-LOW'
          THEN o_totalprice ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE)
          AS low_amount,
        count(*) AS n_orders
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "c10_pivot" -> """
      SELECT o_orderstatus,
        CAST(sum(CAST(CASE WHEN o_orderpriority = '1-URGENT'
          THEN o_totalprice END AS DECIMAL(18,4))) AS DOUBLE)
          AS urgent_amount,
        CAST(sum(CAST(CASE WHEN o_orderpriority = '2-HIGH'
          THEN o_totalprice END AS DECIMAL(18,4))) AS DOUBLE)
          AS high_amount,
        CAST(sum(CAST(CASE WHEN o_orderpriority = '3-MEDIUM'
          THEN o_totalprice END AS DECIMAL(18,4))) AS DOUBLE)
          AS medium_amount
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "c11_rollup" -> s"""
      SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             coalesce(l_linestatus, 'ALL') AS linestatus,
             CAST(grouping(l_returnflag)*2 + grouping(l_linestatus) AS BIGINT)
               AS gid,
             ${sqlDsum("l_quantity")} AS sum_qty,
             count(*) AS n_rows
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY gid, returnflag, linestatus""",
    "c11_cube" -> s"""
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             CAST(grouping(o_orderstatus)*2 + grouping(o_orderpriority)
               AS BIGINT) AS gid,
             ${sqlDsum("o_totalprice")} AS total_price,
             count(*) AS n_orders
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY gid, status, priority""",
    "c11_grouping_sets" -> s"""
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             CAST(grouping(o_orderstatus)*2 + grouping(o_orderpriority)
               AS BIGINT) AS gid,
             ${sqlDsum("o_totalprice")} AS total_price,
             count(*) AS n_orders
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY gid, status, priority""",
    "c12_window_rank" -> """
      SELECT o_custkey, o_orderkey, o_totalprice,
        CAST(row_number() OVER w_price AS BIGINT) AS price_rank,
        CAST(rank() OVER w_price AS BIGINT) AS price_rank_ties,
        CAST(dense_rank() OVER w_price AS BIGINT) AS price_dense_rank,
        lag(o_totalprice, 1) OVER w_date AS prev_price,
        lead(o_totalprice, 1) OVER w_date AS next_price
      FROM orders
      WINDOW
        w_price AS (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey),
        w_date AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey""",
    "c12_window_frames" -> """
      SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) OVER
          (PARTITION BY l_suppkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS running_qty,
        (CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) OVER
          (PARTITION BY l_suppkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / CAST(count(*) OVER
          (PARTITION BY l_suppkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE))
          AS moving_avg_qty
      FROM lineitem
      ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber,
        l_quantity""",
    "c10_unpivot" -> """
      SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value
      FROM part
      UNION ALL
      SELECT p_partkey, 'p_size', CAST(p_size AS DOUBLE) FROM part
      ORDER BY p_partkey, metric""",
    "c12_window_analytics" -> """
      SELECT o_custkey, o_orderkey,
        CAST(ntile(4) OVER w_date AS BIGINT) AS quartile,
        first_value(o_totalprice) OVER w_full AS first_price,
        last_value(o_totalprice) OVER w_full AS last_price,
        nth_value(o_totalprice, 2) OVER w_full AS second_price
      FROM orders
      WINDOW
        w_date AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        w_full AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey""",
    "c13_topk" -> """
      SELECT l_orderkey, l_linenumber, l_extendedprice
      FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      LIMIT 100""",
    "c14_setops" -> """
      WITH a AS (SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer
                 WHERE c_acctbal > 5000),
           b AS (SELECT CAST(s_nationkey AS BIGINT) AS k FROM supplier)
      SELECT 'union' AS op, k FROM (SELECT k FROM a UNION SELECT k FROM b)
      UNION ALL
      SELECT 'intersect', k FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
      UNION ALL
      SELECT 'except', k FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
      ORDER BY op, k""",
    "c15_strings" -> """
      SELECT p_partkey,
             lower(p_type) AS type_lc,
             upper(p_name) AS name_uc,
             p_brand || '#' || p_type AS brand_type,
             substring(p_name, 1, 5) AS name_prefix,
             CAST(length(p_name) AS BIGINT) AS name_len,
             trim(p_name) AS name_trim,
             replace(p_type, ' ', '_') AS type_snake,
             regexp_extract(p_name, '([a-z]+)', 1) AS first_token,
             lpad(p_brand, 12, '*') AS brand_padded,
             contains(p_name, 'green') AS is_green,
             CAST(strpos(p_name, 'o') AS BIGINT) AS first_o
      FROM part ORDER BY p_partkey""",
    "c16_dates" -> """
      SELECT o_orderkey,
             CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(month(o_orderdate) AS BIGINT) AS o_month,
             CAST(day(o_orderdate) AS BIGINT) AS o_day,
             CAST(isodow(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_isodow,
             date_trunc('month', o_orderdate) AS month_start,
             CAST(o_orderdate AS DATE) AS o_date,
             CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE)
               AS next_month,
             datediff('day', CAST(o_orderdate AS DATE),
               CAST('2002-01-01' AS DATE)) AS days_to_2002,
             strftime(o_orderdate, '%Y-%m-%d') AS date_str
      FROM orders ORDER BY o_orderkey""",
    "c17_math" -> """
      SELECT p_partkey,
             abs(p_retailprice - CAST(1000.0 AS DOUBLE)) AS abs_delta,
             CAST(round(CAST(p_retailprice AS DECIMAL(18,4)), 2) AS DOUBLE)
               AS price_rounded,
             sqrt(p_retailprice) AS price_sqrt,
             p_retailprice * p_retailprice AS price_sq,
             CAST(p_partkey % 7 AS BIGINT) AS key_mod7,
             CAST(sign(p_retailprice - CAST(1000.0 AS DOUBLE)) AS DOUBLE)
               AS delta_sign,
             CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
             CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
             greatest(p_retailprice, CAST(500.0 AS DOUBLE))
               AS price_floor500,
             least(CAST(p_size AS BIGINT), 25) AS size_cap25
      FROM part ORDER BY p_partkey""",
    "c18_arrays" -> """
      SELECT p_partkey,
             array_to_string(string_split(p_name, ' '), '|') AS words,
             CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
             list_contains(string_split(p_name, ' '), 'green') AS has_green,
             array_to_string(list_transform(string_split(p_name, ' '),
               w -> upper(w)), '|') AS words_uc,
             coalesce(array_to_string(list_filter(string_split(p_name, ' '),
               w -> length(w) > 4), '|'), '') AS long_words,
             array_to_string(list_sort(string_split(p_name, ' ')), '|')
               AS words_sorted,
             string_split(p_name, ' ')[1] AS first_word
      FROM part ORDER BY p_partkey""",
    "c18_explode" -> """
      SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
      FROM part ORDER BY p_partkey, word""",
    "c19_json" -> """
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
             to_json(struct_pack(t := event_type, u := user_id)) AS packed,
             event_type AS struct_type
      FROM events ORDER BY event_id""",
    "c20_incremental" -> """
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderstatus <> 'P'
      UNION ALL
      SELECT o_orderkey, o_custkey, 'F' AS o_orderstatus,
             o_totalprice * 1.1 AS o_totalprice
      FROM orders WHERE o_orderstatus = 'P'
      ORDER BY o_orderkey""",
    "c21_ephemeral" -> s"""
      WITH stg_orders AS (
        SELECT o_orderkey, o_custkey, o_totalprice,
               CAST(o_orderdate AS DATE) AS order_date
        FROM orders
      ),
      enriched AS (
        SELECT o.*, c.c_mktsegment
        FROM stg_orders o JOIN customer c ON o.o_custkey = c.c_custkey
      )
      SELECT c_mktsegment,
             count(*) AS n_orders,
             ${sqlDsum("o_totalprice")} AS segment_revenue
      FROM enriched
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",
    "c22_tests" -> """
      SELECT 'not_null_customer_custkey' AS test,
             CAST(count(*) AS BIGINT) AS violations
        FROM customer WHERE c_custkey IS NULL
      UNION ALL
      SELECT 'unique_orders_orderkey', CAST(count(*) AS BIGINT) FROM
        (SELECT o_orderkey FROM orders GROUP BY o_orderkey
         HAVING count(*) > 1)
      UNION ALL
      SELECT 'relationships_lineitem_orders', CAST(count(*) AS BIGINT)
        FROM lineitem l WHERE NOT EXISTS
          (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      UNION ALL
      SELECT 'singular_nonnegative_clv', CAST(count(*) AS BIGINT) FROM
        (SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,4))) AS clv
         FROM orders GROUP BY o_custkey HAVING clv < 0)
      ORDER BY test""")
}
