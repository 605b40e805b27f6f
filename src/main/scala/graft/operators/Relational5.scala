package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 relational completions: skyline (Pareto frontier) and
  * per-group mode — analytics the reference's warehouses answer with
  * NOT EXISTS / arg_max SQL, re-expressed in the shapes that survive
  * scale (the oracle keeps the quadratic spec; the engine runs the
  * linear one).
  */
object Relational5 extends QueryPack {

  /** Skyline / Pareto frontier of parts — maximize p_size, minimize
    * p_retailprice; a part is dominated if another is at least as
    * large AND at most as expensive, strictly better in one.
    *
    * Scale: the textbook NOT-EXISTS spec (the oracle) is O(n²). The
    * engine reduces first: per-size min price (one keyed aggregation —
    * |sizes| rows), then a running min over sizes descending marks the
    * undominated (size, price) corners, and a broadcast join re-emits
    * the winning parts. The quadratic step runs over ≤|sizes| rows
    * regardless of table size — the standard sort-scan 2-D skyline.
    */
  def qSkyline(spark: SparkSession, dir: String): DataFrame = {
    val part = t(spark, dir, "part")
    val perSize = part.groupBy("p_size")
      .agg(min(col("p_retailprice")).as("min_price"))
    // strictly-larger sizes only: rows precede in size-desc order
    val wLarger = Window.orderBy(col("p_size").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val corners = perSize
      .withColumn("larger_min", min(col("min_price")).over(wLarger))
      .filter(col("larger_min").isNull
        || col("larger_min") > col("min_price"))
      .select(col("p_size").as("sk_size"), col("min_price"))
    part.join(broadcast(corners),
        part("p_size") === col("sk_size")
          && part("p_retailprice") === col("min_price"))
      .select("p_partkey", "p_name", "p_size", "p_retailprice")
      .orderBy("p_partkey")
  }

  /** Per-group mode (most frequent value) with a deterministic
    * tie-break (higher count first, then lexicographic value): the
    * modal order priority per order status. Two keyed aggregations —
    * the distributed mode shape (count per (group, value), then top-1
    * per group); never a collect or a sort of the raw table.
    */
  def qMode(spark: SparkSession, dir: String): DataFrame = {
    val counts = t(spark, dir, "orders")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("n").desc, col("o_orderpriority"))
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_orderstatus"),
        col("o_orderpriority").as("mode_priority"), col("n"))
      .orderBy("o_orderstatus")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_skyline" -> qSkyline _,
    "q_mode" -> qMode _)

  val oracles: Map[String, String] = Map(
    "q_skyline" -> """
      SELECT p_partkey, p_name, p_size, p_retailprice FROM part p
      WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_size >= p.p_size
          AND q.p_retailprice <= p.p_retailprice
          AND (q.p_size > p.p_size OR q.p_retailprice < p.p_retailprice))
      ORDER BY p_partkey""",
    "q_mode" -> """
      WITH counts AS (
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders GROUP BY o_orderstatus, o_orderpriority
      )
      SELECT o_orderstatus, o_orderpriority AS mode_priority, n
      FROM (
        SELECT *, row_number() OVER (PARTITION BY o_orderstatus
          ORDER BY n DESC, o_orderpriority) AS rn
        FROM counts
      ) WHERE rn = 1
      ORDER BY o_orderstatus""")
}
