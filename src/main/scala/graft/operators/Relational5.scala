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
    // top-1 per group as a lexicographic struct-min hash aggregate
    // (the sim_pq argmin idiom): (-n, priority) min = (n DESC,
    // priority ASC) first row, with no WindowExec and no sort at all
    counts
      .select(col("o_orderstatus"),
        struct((-col("n")).as("nn"), col("o_orderpriority").as("p"),
          col("n").as("n")).as("s"))
      .groupBy("o_orderstatus").agg(min(col("s")).as("s"))
      .select(col("o_orderstatus"), col("s.p").as("mode_priority"),
        col("s.n").as("n"))
      .orderBy("o_orderstatus")
  }

  /** C8 (completion) — ordered string aggregation (LISTAGG /
    * string_agg): nation names per region, comma-joined in lexical
    * order. Deterministic by sorting the collected array before the
    * join (collect_list order is partition-arrival order — never
    * expose it unsorted).
    */
  def qListagg(spark: SparkSession, dir: String): DataFrame = {
    val n = t(spark, dir, "nation")
    val r = t(spark, dir, "region")
    n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(
        concat_ws(",", array_sort(collect_list(col("n_name"))))
          .as("nations"),
        count(lit(1)).as("n_nations"))
      .orderBy("r_name")
  }

  /** C14 (completion) — multiset set ops (INTERSECT ALL / EXCEPT ALL):
    * customer keys of completed vs open orders WITH multiplicities —
    * a customer with 3 'F' and 2 'O' orders contributes 2 rows to the
    * intersection and 1 to the except. Spark's intersectAll/exceptAll
    * plan as one aggregation per side + a join on counts — no
    * quadratic step, shuffles keyed on the row value.
    */
  def c14SetopsAll(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val a = o.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("k"))
    val b = o.filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("k"))
    a.intersectAll(b).withColumn("op", lit("intersect_all"))
      .unionByName(a.exceptAll(b).withColumn("op", lit("except_all")))
      .orderBy("op", "k")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_skyline" -> qSkyline _,
    "q_mode" -> qMode _,
    "q_listagg" -> qListagg _,
    "c14_setops_all" -> c14SetopsAll _)

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
      ORDER BY o_orderstatus""",
    "q_listagg" -> """
      SELECT r_name,
             string_agg(n_name, ',' ORDER BY n_name) AS nations,
             count(*) AS n_nations
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name
      ORDER BY r_name""",
    "c14_setops_all" -> """
      WITH a AS (SELECT o_custkey AS k FROM orders
                 WHERE o_orderstatus = 'F'),
           b AS (SELECT o_custkey AS k FROM orders
                 WHERE o_orderstatus = 'O')
      SELECT k, 'intersect_all' AS op FROM (
        SELECT k FROM a INTERSECT ALL SELECT k FROM b)
      UNION ALL
      SELECT k, 'except_all' AS op FROM (
        SELECT k FROM a EXCEPT ALL SELECT k FROM b)
      ORDER BY op, k""")
}
