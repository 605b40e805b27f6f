package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D3 + complex-plan analytics: the reference's flagship Python model is
  * a prophet forecast over daily orders
  * (`/root/reference/projects/adapter/cli_tests/projects/002_jaffle_shop/
  * fal_models/orders_forecast.py`). The rebuild's deterministic twin is
  * a seasonal-naive forecast — same pipeline shape (daily aggregate →
  * per-series model → prediction table) with window functions instead of
  * an MCMC fit, so the oracle can check it value-for-value.
  */
object Analytics extends QueryPack {

  /** D3 — seasonal-naive forecast: predicted value for a day = mean of
    * the same weekday over the 4 prior weeks (lag 7/14/21/28 on the
    * daily series). One shuffle on nothing wider than the daily
    * aggregate; the window partitions by weekday so state is 7 small
    * series regardless of history length.
    */
  def d3Forecast(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("revenue"))
    val byWeekday = Window
      .partitionBy(weekday(col("day")))
      .orderBy("day")
    def seasonalNaive(c: String) = {
      val lags = Seq(1, 2, 3, 4).map(k =>
        lag(col(c), k).over(byWeekday).cast("decimal(18,4)"))
      // exact decimal sum, then one double division — decimal/int
      // division scales differ across engines, double division doesn't
      lags.reduce(_ + _).cast("double") / 4.0
    }
    daily
      .withColumn("forecast_orders", seasonalNaive("n_orders"))
      .withColumn("forecast_revenue", seasonalNaive("revenue"))
      .filter(col("forecast_orders").isNotNull)
      .select("day", "n_orders", "forecast_orders", "revenue",
        "forecast_revenue")
      .orderBy("day")
  }

  /** C5–C8 composite — the TPC-H Q5 shape: six-table join (two
    * broadcast dims, region filter pushed through nation) with a
    * revenue rollup. The plan to want at 100 TB: lineitem scans once,
    * dims broadcast, one shuffle for the final group-by.
    */
  def q5Analytic(spark: SparkSession, dir: String): DataFrame = {
    val customer = t(spark, dir, "customer")
    val orders = t(spark, dir, "orders")
    val lineitem = t(spark, dir, "lineitem")
    val supplier = t(spark, dir, "supplier")
    val nation = broadcast(t(spark, dir, "nation"))
    val region = broadcast(t(spark, dir, "region"))
    lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(supplier, lineitem("l_suppkey") === supplier("s_suppkey") &&
        customer("c_nationkey") === supplier("s_nationkey"))
      .join(nation, supplier("s_nationkey") === nation("n_nationkey"))
      .join(region, nation("n_regionkey") === region("r_regionkey"))
      .filter(region("r_name") === "ASIA" &&
        orders("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        orders("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(nation("n_name"))
      .agg(dsum(lineitem("l_extendedprice") *
        (lit(1.0) - lineitem("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d3_forecast" -> d3Forecast _,
    "q5_analytic" -> q5Analytic _)

  val oracles: Map[String, String] = Map(
    "d3_forecast" -> s"""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               count(*) AS n_orders,
               ${sqlDsum("o_totalprice")} AS revenue
        FROM orders GROUP BY 1
      ),
      forecast AS (
        SELECT day, n_orders, revenue,
          CAST(CAST(lag(n_orders, 1) OVER w AS DECIMAL(18,4)) +
               CAST(lag(n_orders, 2) OVER w AS DECIMAL(18,4)) +
               CAST(lag(n_orders, 3) OVER w AS DECIMAL(18,4)) +
               CAST(lag(n_orders, 4) OVER w AS DECIMAL(18,4))
            AS DOUBLE) / 4.0 AS forecast_orders,
          CAST(CAST(lag(revenue, 1) OVER w AS DECIMAL(18,4)) +
               CAST(lag(revenue, 2) OVER w AS DECIMAL(18,4)) +
               CAST(lag(revenue, 3) OVER w AS DECIMAL(18,4)) +
               CAST(lag(revenue, 4) OVER w AS DECIMAL(18,4))
            AS DOUBLE) / 4.0 AS forecast_revenue
        FROM daily
        WINDOW w AS (PARTITION BY isodow(day) ORDER BY day)
      )
      SELECT day, n_orders, forecast_orders, revenue, forecast_revenue
      FROM forecast WHERE forecast_orders IS NOT NULL
      ORDER BY day""",
    "q5_analytic" -> s"""
      SELECT n_name,
             ${sqlDsum("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)")}
               AS revenue,
             count(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
                   AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY n_name""")
}
