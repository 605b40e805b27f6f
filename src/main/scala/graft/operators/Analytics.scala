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

  /** D3 — anomaly detection (the reference's `examples/anomaly-detection`
    * rebuilt Spark-native): per event type, z-score each event's value
    * against the rolling mean/std of the 50 preceding events; emit
    * |z| > 3 outliers. Moments come from exact decimal sums (the
    * q_stats_moments parity pattern), so z is bitwise portable. One
    * shuffle on event_type; window state is the 50-row frame.
    */
  def d3Anomaly(spark: SparkSession, dir: String): DataFrame = {
    // The 50-row frame as prefix-sum differences: a bounded sliding
    // frame makes WindowExec re-scan the frame for every row (O(50·n)
    // decimal adds); running totals are one O(n) pass over the same
    // sort. Decimal arithmetic is exact, so cum(i−1)−cum(i−51) is
    // bitwise the frame sum the oracle computes directly. decimal
    // (28,4) gives the prefix sums 10 orders of headroom over the
    // frame-sum bound.
    //
    // Scale: `event_type` has a handful of values, so a type-keyed
    // window is one corpus-sized partition per type at 100 TB. Both
    // the prefixes AND their rank−51 lag come from ONE
    // [[withLaggedRunningSums]] pass (balanced range shuffle +
    // broadcast offsets; the lag rides the same in-partition window,
    // partition-boundary rows resolve through broadcast lookups) —
    // r9's (type, rank − 51) corpus×corpus self-join and its two full
    // hash exchanges are gone (VERDICT r9 item #4). The preceding-row
    // count needs no lookup at all: it is rank − 1 clamped to the
    // frame, least(rank − 1, 50).
    val ev = t(spark, dir, "events")
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
      .withColumn("__v1", col("value").cast("decimal(28,4)"))
      .withColumn("__v2",
        (col("value") * col("value")).cast("decimal(28,4)"))
      .withColumn("__ord", struct(col("ts"), col("event_id")))
    val pre = withLaggedRunningSums(ev, "event_type", "__ord", "__rn",
      "__n", Seq("S1" -> "__v1", "S2" -> "__v2"), 51)
    // S(j) = inclusive prefix of the first j rows; the 50-row frame
    // ending before rank rn is S(rn−1) − S(rn−51), with S(rn−1) row-
    // local (own inclusive prefix minus own value) and S(rn−51) the
    // lagged prefix (null below rank 52 = S(0) = 0)
    pre
      .select(col("event_id"), col("event_type"), col("value"),
        ((col("S1") - col("__v1")) - coalesce(col("S1_lag"),
          lit(0).cast("decimal(28,4)"))).cast("double").as("s1"),
        ((col("S2") - col("__v2")) - coalesce(col("S2_lag"),
          lit(0).cast("decimal(28,4)"))).cast("double").as("s2"),
        least(col("__rn") - 1, lit(50L)).cast("double").as("n"))
      .filter(col("n") >= 30)
      .withColumn("mean_prev", col("s1") / col("n"))
      // variance clamped at 0 INSIDE the sqrt and required > 0 in the
      // filter: a constant-valued frame makes s2 − s1²/n a tiny
      // negative in float, where DuckDB's sqrt RAISES (sometimes even
      // for filtered-out lanes, vectorization-dependent) while Spark
      // yields NaN — both sides now share the clamp + v>0 gate so the
      // emitted rows are identical and the oracle can never error.
      .withColumn("v",
        (col("s2") - col("s1") * col("s1") / col("n")) / col("n"))
      .withColumn("std_prev", sqrt(greatest(col("v"), lit(0.0))))
      .withColumn("z", (col("value") - col("mean_prev")) / col("std_prev"))
      .filter(col("v") > 0.0 && abs(col("z")) > 3.0)
      .select("event_id", "event_type", "value", "mean_prev", "z")
      .orderBy("event_id")
  }

  /** D3 — lexicon sentiment (the reference's `examples/sentiment-analysis`
    * rebuilt Spark-native): polarity = (pos − neg) / tokens against a
    * fixed lexicon, thresholded into labels. Map-only per document —
    * the classifier swaps out, the scoring plumbing is the operator.
    */
  def d3Sentiment(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val pos = Seq("fast", "big", "value")
    val neg = Seq("slow", "small")
    def hits(words: Seq[String]) =
      size(filter(col("toks"), t => t.isin(words.map(x => x: Any): _*)))
        .cast("long")
    t(spark, dir, "documents")
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        hits(pos).as("n_pos"), hits(neg).as("n_neg"),
        size(col("toks")).cast("long").as("n_tokens"))
      .withColumn("polarity",
        (col("n_pos") - col("n_neg")).cast("double") /
          col("n_tokens").cast("double"))
      .withColumn("label",
        when(col("polarity") > 0.01, "positive")
          .when(col("polarity") < -0.01, "negative")
          .otherwise("neutral"))
      .orderBy("doc_id")
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

  /** D3 — CUSUM change-point detection over the daily order-revenue
    * series (the drift detector next to [[d3Anomaly]]'s rolling
    * z-score): S_t = Σ_{i≤t}(x_i − μ), reported as a share of total
    * revenue; a day where |S_t / total| crosses 1% marks a level
    * shift. Deviations are rounded then summed in exact decimals, so
    * the running statistic is order-independent and the oracle replays
    * it bitwise (a raw double window-sum would depend on DuckDB's
    * segment-tree association order).
    *
    * Scale: one hash aggregation to the daily grain, then windows over
    * the tiny day-series — the corpus-size pass is the aggregation
    * only.
    */
  def d3Changepoint(spark: SparkSession, dir: String): DataFrame = {
    val all = Window.partitionBy()
    val cum = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val daily = t(spark, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(dsum(col("o_totalprice")).as("daily"))
    daily
      .withColumn("tot",
        sum(col("daily").cast("decimal(28,4)")).over(all).cast("double"))
      .withColumn("n", count(lit(1)).over(all).cast("double"))
      .withColumn("dev", col("daily") - col("tot") / col("n"))
      // dev is quantized with the bitwise-portable floor(x*1e4+0.5)
      // (round half toward +inf, same in both engines) and accumulated
      // as an exact INTEGER before one final /1e4: round(·, 4) can land
      // on half-way points (tot/n with a power-of-two day count) where
      // Spark HALF_UP and DuckDB nearbyint disagree, and a double→
      // DECIMAL(28,8) cast of the quantized quotient diverges too once
      // |dev| ~ 1e7 (DuckDB scales by 10^8 in double space, ulp ≈ 0.1
      // at 1e15; Spark converts exactly) — integers sidestep both. The
      // share is a raw quotient of exact-operand doubles.
      .withColumn("cusum",
        (sum(floor(col("dev") * 1e4 + 0.5).cast("long"))
          .over(cum).cast("double") / 1e4))
      .select(col("d"), col("daily"),
        (col("cusum") / col("tot")).as("cusum_share"),
        (abs(col("cusum") / col("tot")) > 0.01).as("is_shift"))
      .orderBy("d")
  }

  /** D3 — seasonal decomposition (STL-lite): daily order counts split
    * into trend (centered 7-day moving average), weekday seasonal
    * (mean detrended value per weekday), and residual. The decomposed
    * series is what anomaly/forecast steps consume downstream of the
    * reference's time-series examples.
    *
    * Scale: the windows run over the daily aggregate (calendar-bounded
    * rows at any corpus size — the q_islands posture); the 7-row
    * seasonal table broadcasts back. Float parity: the trend is an
    * exact-integer window sum over counts divided once; seasonal means
    * go through [[lsum]].
    */
  def d3Seasonal(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("n_orders"))
    val w7 = Window.orderBy("day").rowsBetween(-3, 3)
    val detrended = daily
      .withColumn("trend",
        sum(col("n_orders")).over(w7).cast("double") /
          count(col("n_orders")).over(w7).cast("double"))
      .withColumn("detrended",
        col("n_orders").cast("double") - col("trend"))
      .withColumn("wd", weekday(col("day")))
    val seasonal = detrended.groupBy("wd")
      .agg((lsum(col("detrended")) /
        count(lit(1)).cast("double")).as("seasonal"))
    detrended.join(broadcast(seasonal), "wd")
      .select(col("day"), col("n_orders"), col("trend"),
        col("seasonal"),
        (col("detrended") - col("seasonal")).as("residual"))
      .orderBy("day")
  }

  /** Rolling 30-day correlation between daily order count and daily
    * revenue — the co-movement signal a metrics pipeline watches for
    * decoupling. Frame sums are exact decimals over the
    * calendar-bounded daily aggregate; the correlation folds them with
    * division/multiplication/sqrt only (sqrt is IEEE
    * correctly-rounded in both engines, unlike exp/pow), so the series
    * hash-matches. Emitted only where the frame is full (30 days).
    */
  def qMovingCorr(spark: SparkSession, dir: String): DataFrame = {
    // Revenue as integer THOUSANDS of dollars (exact decimal sum,
    // divided and rounded once): every frame sum below is then exact
    // int64 arithmetic small enough that even syy stays under 2^53,
    // so the double conversions are value-preserving and the final
    // float math is engine-identical. (Cents kept syy exact only in
    // decimal(38,0), whose decimal→double conversion rounds
    // differently across engines at ~1e21; raw float products diverge
    // a step earlier, at the double→decimal cast.) Correlation is
    // scale-invariant, so the unit choice only defines the metric's
    // rounding granularity.
    val daily = t(spark, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("x"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")) / 1000, 0)
          .cast("long").as("yk"))
    val w30 = Window.orderBy("day").rowsBetween(-29, 0)
    def s(c: org.apache.spark.sql.Column) = sum(c).over(w30)
    val n = count(lit(1)).over(w30)
    daily
      .select(col("day"), n.as("nw"),
        s(col("x")).cast("double").as("sx"),
        s(col("yk")).cast("double").as("sy"),
        s(col("x") * col("x")).cast("double").as("sxx"),
        s(col("yk") * col("yk")).cast("double").as("syy"),
        s(col("x") * col("yk")).cast("double").as("sxy"))
      .filter(col("nw") === 30)
      .select(col("day"),
        ((lit(30.0) * col("sxy") - col("sx") * col("sy")) /
          sqrt((lit(30.0) * col("sxx") - col("sx") * col("sx")) *
            (lit(30.0) * col("syy") - col("sy") * col("sy"))))
          .as("corr30"))
      .orderBy("day")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d3_forecast" -> d3Forecast _,
    "d3_anomaly" -> d3Anomaly _,
    "d3_changepoint" -> d3Changepoint _,
    "d3_seasonal" -> d3Seasonal _,
    "d3_sentiment" -> d3Sentiment _,
    "q_moving_corr" -> qMovingCorr _,
    "q5_analytic" -> q5Analytic _)

  val oracles: Map[String, String] = Map(
    "q_moving_corr" -> """
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS x,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))) / 1000,
                 0) AS BIGINT) AS yk
        FROM orders GROUP BY 1),
      sums AS (
        SELECT day,
               count(*) OVER w30 AS nw,
               CAST(sum(x) OVER w30 AS DOUBLE) AS sx,
               CAST(sum(yk) OVER w30 AS DOUBLE) AS sy,
               CAST(sum(x * x) OVER w30 AS DOUBLE) AS sxx,
               CAST(sum(yk * yk) OVER w30 AS DOUBLE) AS syy,
               CAST(sum(x * yk) OVER w30 AS DOUBLE) AS sxy
        FROM daily
        WINDOW w30 AS (ORDER BY day
                       ROWS BETWEEN 29 PRECEDING AND CURRENT ROW))
      SELECT day,
             (30.0 * sxy - sx * sy) /
               sqrt((30.0 * sxx - sx * sx) * (30.0 * syy - sy * sy))
               AS corr30
      FROM sums WHERE nw = 30 ORDER BY day""",
    "d3_seasonal" -> s"""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders
        FROM orders GROUP BY 1),
      det AS (
        SELECT day, n_orders,
               CAST(sum(n_orders) OVER w7 AS DOUBLE) /
                 CAST(count(n_orders) OVER w7 AS DOUBLE) AS trend,
               CAST(n_orders AS DOUBLE) -
                 CAST(sum(n_orders) OVER w7 AS DOUBLE) /
                 CAST(count(n_orders) OVER w7 AS DOUBLE) AS detrended,
               isodow(day) - 1 AS wd
        FROM daily
        WINDOW w7 AS (ORDER BY day
                      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      seas AS (
        SELECT wd, ${sqlLsum("detrended")} / CAST(count(*) AS DOUBLE)
                 AS seasonal
        FROM det GROUP BY wd)
      SELECT day, n_orders, trend, seasonal,
             detrended - seasonal AS residual
      FROM det JOIN seas ON det.wd = seas.wd
      ORDER BY day""",
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
    "d3_changepoint" -> s"""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               ${sqlDsum("o_totalprice")} AS daily
        FROM orders GROUP BY 1
      ),
      st AS (
        SELECT d, daily,
               CAST(SUM(CAST(daily AS DECIMAL(28,4))) OVER () AS DOUBLE)
                 AS tot,
               CAST(COUNT(*) OVER () AS DOUBLE) AS n
        FROM daily
      ),
      dv AS (
        SELECT d, daily, tot, (daily - tot / n) AS dev FROM st
      ),
      cu AS (
        SELECT d, daily, tot,
               CAST(SUM(CAST(floor(dev * 1e4 + 0.5) AS BIGINT))
                 OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS DOUBLE) / 1e4 AS cusum
        FROM dv
      )
      SELECT d, daily, cusum / tot AS cusum_share,
             (abs(cusum / tot) > 0.01) AS is_shift
      FROM cu ORDER BY d""",
    "d3_anomaly" -> """
      WITH stats AS (
        SELECT event_id, event_type, value,
               CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
                 AS s1,
               CAST(sum(CAST(value * value AS DECIMAL(18,4))) OVER w
                 AS DOUBLE) AS s2,
               CAST(count(value) OVER w AS DOUBLE) AS n
        FROM events
        WINDOW w AS (PARTITION BY event_type
                     ORDER BY CAST(ts AS TIMESTAMP), event_id
                     ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING)
      ),
      scored AS (
        SELECT event_id, event_type, value,
               s1 / n AS mean_prev,
               (s2 - s1 * s1 / n) / n AS v,
               (value - s1 / n) /
                 sqrt(greatest((s2 - s1 * s1 / n) / n, 0.0)) AS z
        FROM stats WHERE n >= 30
      )
      SELECT event_id, event_type, value, mean_prev, z
      FROM scored WHERE v > 0.0 AND abs(z) > 3.0 ORDER BY event_id""",
    "d3_sentiment" -> """
      WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x != '')
                 AS w
        FROM documents
      ),
      counted AS (
        SELECT doc_id,
               CAST(len(list_filter(w,
                 t -> t IN ('fast', 'big', 'value'))) AS BIGINT) AS n_pos,
               CAST(len(list_filter(w,
                 t -> t IN ('slow', 'small'))) AS BIGINT) AS n_neg,
               CAST(len(w) AS BIGINT) AS n_tokens
        FROM toks
      )
      SELECT doc_id, n_pos, n_neg, n_tokens,
             CAST(n_pos - n_neg AS DOUBLE) / CAST(n_tokens AS DOUBLE)
               AS polarity,
             CASE
               WHEN CAST(n_pos - n_neg AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                    > 0.01 THEN 'positive'
               WHEN CAST(n_pos - n_neg AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                    < -0.01 THEN 'negative'
               ELSE 'neutral' END AS label
      FROM counted ORDER BY doc_id""",
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
