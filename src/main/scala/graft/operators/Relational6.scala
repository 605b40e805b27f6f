package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 relational completions: recursive traversal (the WITH
  * RECURSIVE surface the reference's warehouses answer — DuckDB/Postgres
  * recursive CTEs — re-expressed as iterative frontier expansion, the
  * only shape that distributes), gaps-and-islands, and RFM segmentation.
  */
object Relational6 extends QueryPack {

  /** Recursive BFS / transitive closure: nodes within 3 hops of the
    * seed suppliers over the supplier—part bipartite graph (distinct
    * lineitem pairs), with the minimal hop distance per node — the
    * iterative twin of the oracle's `WITH RECURSIVE` (Spark has no
    * recursive CTE; unrolled frontier expansion IS the distributed
    * idiom, cf. the label-propagation notes on dd_cluster).
    *
    * Scale: the edge table is [[SharedGraph]]'s src-bucketed
    * materialization (shared with q_pagerank — built once per process,
    * read pre-clustered with no exchange); each hop shuffles only the
    * frontier (≪ edges), and visited-set dedup is a keyed anti-join —
    * no driver-side state, depth bounds the loop.
    */
  def qRecursiveBfs(spark: SparkSession, dir: String): DataFrame = {
    val edges = SharedGraph.edges(spark, dir)
      .select(col("src").as("u"), col("dst").as("v"))
    val seed = t(spark, dir, "supplier")
      .filter(col("s_suppkey") <= 3)
      .select((col("s_suppkey") * 2).as("node"))
    var reached = seed.withColumn("dist", lit(0))
    var frontier = seed
    for (d <- 1 to 3) {
      val next = frontier.join(edges, frontier("node") === edges("u"))
        .select(col("v").as("node")).distinct()
        .join(reached.select("node"), Seq("node"), "left_anti")
        .cache()
      reached = reached.union(next.withColumn("dist", lit(d)))
      frontier = next
    }
    reached.select(
      when(col("node") % 2 === 0, lit("supplier")).otherwise(lit("part"))
        .as("kind"),
      expr("node div 2").as("key"),
      col("dist").cast("long").as("dist"))
      .orderBy("dist", "kind", "key")
  }

  /** Gaps-and-islands: maximal runs of consecutive busy days (≥ 7
    * orders/day). The date-minus-row_number trick groups consecutive
    * dates into one island key; the unpartitioned window runs over the
    * daily aggregate, whose size is calendar-bounded (≤ a few thousand
    * rows at ANY corpus scale), so the global sort is scale-safe here —
    * unlike a global window over a fact table (cf. tx_token_budget).
    */
  def qIslands(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 7)
    val grp = date_sub(col("day"),
      row_number().over(Window.orderBy("day")))
    daily.withColumn("grp", grp)
      .groupBy("grp")
      .agg(min(col("day")).as("island_start"),
        max(col("day")).as("island_end"),
        count(lit(1)).as("n_days"),
        sum(col("n")).as("total_orders"))
      .drop("grp")
      .orderBy("island_start")
  }

  /** RFM segmentation: per-customer Recency/Frequency/Monetary quartile
    * scores (ntile(4) semantics, deterministic custkey tie-break) and
    * the concatenated segment label. Each score comes from
    * [[withGlobalNtile]] — the two-phase prefix-sum rank over the
    * range-partitioned per-customer aggregate — so no metric ever
    * funnels through a single-partition window; the three passes chain
    * (each range-parts the previous output, which the helper caches),
    * and the result is bit-identical to the three global ntile(4)s the
    * oracle still runs.
    */
  def qRfm(spark: SparkSession, dir: String): DataFrame = {
    val per = t(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(
        datediff(lit("1998-12-31").cast("date"),
          max(col("o_orderdate").cast("date"))).cast("long")
          .as("recency_days"),
        count(lit(1)).as("frequency"),
        dsum(col("o_totalprice")).as("monetary"))
    val scored = Seq[(String, Seq[org.apache.spark.sql.Column])](
      ("r_score", Seq(col("recency_days"), col("o_custkey"))),
      ("f_score", Seq(col("frequency").desc, col("o_custkey"))),
      ("m_score", Seq(col("monetary").desc, col("o_custkey"))))
      .foldLeft(per) { case (df, (name, order)) =>
        withGlobalNtile(df, 4, name, order: _*)
      }
    scored.select(col("o_custkey"), col("recency_days"),
        col("frequency"), col("monetary"),
        col("r_score"), col("f_score"), col("m_score"))
      .withColumn("segment",
        concat(col("r_score"), col("f_score"), col("m_score")))
      .orderBy("o_custkey")
  }

  /** C7 (completion) — null-aware anti join (`NOT IN <subquery>`):
    * distinct plan semantics from `left_anti`/NOT EXISTS — one NULL in
    * the subquery empties the result, so Spark plans a null-aware anti
    * join (a single-key NAAJ broadcast) instead of a hash anti join.
    * The subquery column here is null-free, so the result matches the
    * anti join and both engines' NOT IN return rows — the PLAN, not
    * the output, is what this query pins down.
    */
  def c7JoinNotin(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(spark, dir)
    spark.sql("""
      SELECT c_custkey, c_name FROM customer
      WHERE c_custkey NOT IN
        (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      ORDER BY c_custkey""")
  }

  /** Chi-square independence test over the status × priority
    * contingency table: Σ (observed − expected)² / expected, expected
    * from the broadcast marginals. One keyed aggregation builds the
    * cell counts (|statuses|·|priorities| rows); marginals and the
    * grand total are tiny aggregates of it; the statistic folds the
    * cell table through the order-independent decimal sum. The fact
    * table is scanned exactly once at any scale.
    */
  def qChisq(spark: SparkSession, dir: String): DataFrame = {
    val cells = t(spark, dir, "orders")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("o"))
      .cache()
    val rowTot = cells.groupBy("o_orderstatus")
      .agg(sum(col("o")).as("row_n"))
    val colTot = cells.groupBy("o_orderpriority")
      .agg(sum(col("o")).as("col_n"))
    val grand = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("o_orderstatus")).as("n_rows_d"),
      countDistinct(col("o_orderpriority")).as("n_cols_d"))
    cells
      .join(broadcast(rowTot), Seq("o_orderstatus"))
      .join(broadcast(colTot), Seq("o_orderpriority"))
      .crossJoin(broadcast(grand))
      .withColumn("e",
        col("row_n").cast("double") * col("col_n").cast("double") /
          col("n").cast("double"))
      .agg(
        // (o−e)·(o−e), not pow(·,2): libm pow is not guaranteed
        // bit-exact across engines; the product is one IEEE multiply
        lsum((col("o").cast("double") - col("e")) *
          (col("o").cast("double") - col("e")) / col("e")).as("chi2"),
        max((col("n_rows_d") - 1) * (col("n_cols_d") - 1)).as("dof"))
  }

  /** Distributed sequence-gap detection (the dual of q_islands): order
    * keys that never appear in lineitem (orders with no line items
    * leave holes in the referenced-key sequence), reported as runs.
    * Scale-safe two-phase form — keys bucket by `div 4096`, gaps
    * interior to a bucket come from a bucket-keyed lead window, gaps
    * that straddle buckets from a lag over the tiny per-bucket
    * (min, max) summary — so no global window ever sees the key table
    * (the oracle keeps the textbook single lag-over-everything spec).
    */
  def qGaps(spark: SparkSession, dir: String): DataFrame =
    gapRuns(t(spark, dir, "lineitem")
      .select(col("l_orderkey").as("k")).distinct(), 4096L)

  /** The two-phase gap algorithm over a distinct key column `k` —
    * package-visible so the property spec can drive it with random key
    * sets (the bucket-boundary handling is the part worth fuzzing).
    */
  private[graft] def gapRuns(keys: DataFrame, bucket: Long): DataFrame = {
    val bucketed = keys.withColumn("b", expr(s"k div $bucket"))
    val inBucket = Window.partitionBy("b").orderBy("k")
    val interior = bucketed
      .withColumn("nxt", lead(col("k"), 1).over(inBucket))
      .filter(col("nxt") - col("k") > 1)
      .select((col("k") + 1).as("gap_start"), (col("nxt") - 1).as("gap_end"))
    val buckets = bucketed.groupBy("b")
      .agg(min(col("k")).as("min_k"), max(col("k")).as("max_k"))
    val wB = Window.orderBy("b") // per-bucket summary: |keys|/bucket rows
    val boundary = buckets
      .withColumn("prev_max", lag(col("max_k"), 1).over(wB))
      .filter(col("prev_max").isNotNull && col("min_k") - col("prev_max") > 1)
      .select((col("prev_max") + 1).as("gap_start"),
        (col("min_k") - 1).as("gap_end"))
    interior.unionByName(boundary)
      .withColumn("gap_len", col("gap_end") - col("gap_start") + 1)
      .orderBy("gap_start")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_recursive_bfs" -> qRecursiveBfs _,
    "q_islands" -> qIslands _,
    "q_rfm" -> qRfm _,
    "c7_join_notin" -> c7JoinNotin _,
    "q_chisq" -> qChisq _,
    "q_gaps" -> qGaps _)

  val oracles: Map[String, String] = Map(
    "q_chisq" -> s"""
      WITH cells AS (
        SELECT o_orderstatus, o_orderpriority, count(*) AS o
        FROM orders GROUP BY 1, 2),
      rt AS (SELECT o_orderstatus, CAST(sum(o) AS BIGINT) AS row_n
             FROM cells GROUP BY 1),
      ct AS (SELECT o_orderpriority, CAST(sum(o) AS BIGINT) AS col_n
             FROM cells GROUP BY 1),
      g AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                   count(DISTINCT o_orderstatus) AS n_rows_d,
                   count(DISTINCT o_orderpriority) AS n_cols_d
            FROM cells),
      e AS (
        SELECT cells.o,
               CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) /
                 CAST(n AS DOUBLE) AS e,
               n_rows_d, n_cols_d
        FROM cells
        JOIN rt USING (o_orderstatus)
        JOIN ct USING (o_orderpriority)
        CROSS JOIN g)
      SELECT ${sqlLsum(
        "(CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e")} AS chi2,
             CAST(max((n_rows_d - 1) * (n_cols_d - 1)) AS BIGINT) AS dof
      FROM e""",
    "q_gaps" -> """
      SELECT prev_k + 1 AS gap_start, k - 1 AS gap_end,
             k - prev_k - 1 AS gap_len
      FROM (
        SELECT k, lag(k) OVER (ORDER BY k) AS prev_k
        FROM (SELECT DISTINCT l_orderkey AS k FROM lineitem))
      WHERE prev_k IS NOT NULL AND k - prev_k > 1
      ORDER BY gap_start""",
    "c7_join_notin" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE c_custkey NOT IN
        (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      ORDER BY c_custkey""",
    "q_recursive_bfs" -> """
      WITH RECURSIVE e AS (
        SELECT DISTINCT l_suppkey * 2 AS u, l_partkey * 2 + 1 AS v
        FROM lineitem),
      ee AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
      bfs(node, dist) AS (
        SELECT s_suppkey * 2, 0 FROM supplier WHERE s_suppkey <= 3
        UNION
        SELECT ee.v, bfs.dist + 1
        FROM bfs JOIN ee ON bfs.node = ee.u
        WHERE bfs.dist < 3)
      SELECT CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'part' END
               AS kind,
             node // 2 AS key,
             CAST(min(dist) AS BIGINT) AS dist
      FROM bfs GROUP BY node
      ORDER BY dist, kind, key""",
    "q_islands" -> """
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n
        FROM orders GROUP BY 1 HAVING count(*) >= 7),
      r AS (SELECT day, n,
                   row_number() OVER (ORDER BY day) AS rn
            FROM daily)
      SELECT min(day) AS island_start, max(day) AS island_end,
             count(*) AS n_days, CAST(sum(n) AS BIGINT) AS total_orders
      FROM r GROUP BY day - CAST(rn AS INTEGER)
      ORDER BY island_start""",
    "q_rfm" -> s"""
      WITH per AS (
        SELECT o_custkey,
               CAST(date_diff('day', max(CAST(o_orderdate AS DATE)),
                 DATE '1998-12-31') AS BIGINT) AS recency_days,
               count(*) AS frequency,
               ${sqlDsum("o_totalprice")} AS monetary
        FROM orders GROUP BY o_custkey),
      scored AS (
        SELECT *,
               CAST(ntile(4) OVER (ORDER BY recency_days, o_custkey)
                 AS BIGINT) AS r_score,
               CAST(ntile(4) OVER (ORDER BY frequency DESC, o_custkey)
                 AS BIGINT) AS f_score,
               CAST(ntile(4) OVER (ORDER BY monetary DESC, o_custkey)
                 AS BIGINT) AS m_score
        FROM per)
      SELECT o_custkey, recency_days, frequency, monetary,
             r_score, f_score, m_score,
             CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) ||
               CAST(m_score AS VARCHAR) AS segment
      FROM scored ORDER BY o_custkey""")
}
