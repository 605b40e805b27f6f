package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch- and layout-based scale operators: the shuffle-reduction
  * toolbox a 100 TB pipeline reaches for when exact global state stops
  * fitting — frequency sketches (count-min), membership filters (bloom
  * semi-join reduction), and multi-dimensional clustering keys
  * (Z-order). No reference citation — driver-mandated §2e scale surface,
  * companions to the HLL sketch in Relational (c9_approx_distinct).
  *
  * Every hash is the same SQL-portable family as Dedup's MinHash
  * (md5-prefix 32-bit base, affine transforms mod 2^61−1), so DuckDB
  * reproduces sketch cells, bloom bits and estimates bit-for-bit and
  * all three queries are hash-checked exactly, false positives
  * included.
  */
object Sketches extends QueryPack {

  private val M61 = 2305843009213693951L // 2^61 - 1, as in Dedup
  /** Affine params shared with the oracle SQL (Dedup.minhashParams is
    * seeded deterministically; reusing it keeps one hash family
    * repo-wide).
    */
  private def params(i: Int): (Long, Long) = Dedup.minhashParams(i)

  /** Spark-side 32-bit md5-prefix base hash of a string expression. */
  private def base32(e: String): String =
    s"CAST(conv(substr(md5($e),1,8),16,10) AS BIGINT)"
  /** DuckDB twin of [[base32]]. */
  private def sqlBase32(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 8)) AS BIGINT)"

  /** Count-min sketch heavy hitters over the corpus token stream:
    * d=4 hash rows × w=512 buckets, estimate = min over rows of the
    * bucket count, reported for the exact top-20 tokens next to their
    * true counts (the CMS guarantee: est ≥ exact, overcount bounded by
    * corpus_size/w per row).
    *
    * Scale shape: the sketch is 2048 cells REGARDLESS of corpus size —
    * token totals roll up from the standing doc_terms model
    * (term-bucketed, so the vocabulary aggregation runs with no
    * exchange and no corpus pass), the 4-row explode runs on the
    * (small) distinct-token table, and the per-cell sums shuffle at
    * most 2048 rows. The exact top-20 here is the verification twin;
    * at 100 TB the sketch alone answers "how often does X occur" with
    * no second corpus pass.
    */
  def qCmsHeavy(spark: SparkSession, dir: String): DataFrame = {
    val w = 512
    val tok = TextAnalysis.docTerms(spark, dir)
      .groupBy("term").agg(sum(col("cnt")).as("cnt"))
      .withColumn("b", expr(base32("term")))
      .cache()
    val rows = (0 until 4).map { i =>
      val (a, c) = params(i)
      struct(lit(i).as("h"),
        expr(s"((b * ${a}L + ${c}L) % ${M61}L) % $w").as("bucket"))
    }
    val cells = tok
      .select(col("cnt"), explode(array(rows: _*)).as("e"))
      .groupBy(col("e.h").as("h"), col("e.bucket").as("bucket"))
      .agg(sum(col("cnt")).as("cell"))
    val top = tok.orderBy(col("cnt").desc, col("term")).limit(20)
    top
      .select(col("term"), col("cnt"), explode(array(rows: _*)).as("e"))
      .select(col("term"), col("cnt"), col("e.h").as("h"),
        col("e.bucket").as("bucket"))
      .join(broadcast(cells), Seq("h", "bucket"))
      .groupBy("term")
      .agg(min(col("cnt")).as("exact_cnt"), min(col("cell")).as("cms_cnt"))
      .withColumn("overcount", col("cms_cnt") - col("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("term"))
  }

  /** Bloom-filter semi-join reduction: filter the orders fact stream
    * against an m=8192-bit, k=3 bloom of the BUILDING-segment customer
    * keys BEFORE the exact join — the standard trick that turns a
    * shuffle of the full fact table into a map-side probe plus a small
    * exact verification. Reports, per order status, how many fact rows
    * the filter passes vs how many truly match (the gap = false
    * positives, which both engines must agree on exactly).
    *
    * Scale shape: the bloom bit set is ≤ m values however large the dim
    * side grows (here it broadcasts as one array row); the fact side
    * never shuffles for the probe. Spark's own runtime bloom pushdown
    * (spark.sql.optimizer.runtime.bloomFilter) does this implicitly for
    * joins; the explicit operator makes the technique available to any
    * downstream consumer (e.g. shipping the bit set to a separate job).
    */
  def qBloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val m = 8192
    val posExprs = (0 until 3).map { i =>
      val (a, c) = params(4 + i)
      expr(s"((h * ${a}L + ${c}L) % ${M61}L) % $m")
    }
    val dim = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val bits = dim
      .withColumn("h", expr(base32("CAST(custkey AS STRING)")))
      .select(explode(array(posExprs: _*)).as("pos"))
      .agg(collect_set(col("pos")).as("bits"))
    val probed = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      .withColumn("h", expr(base32("CAST(o_custkey AS STRING)")))
      .crossJoin(broadcast(bits))
      .withColumn("pass_bloom",
        posExprs.map(p => array_contains(col("bits"), p)).reduce(_ && _))
    probed
      .join(broadcast(dim).withColumn("is_match", lit(true)),
        col("o_custkey") === col("custkey"), "left")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("pass_bloom"), 1L).otherwise(0L)).as("n_pass_bloom"),
        sum(when(col("is_match"), 1L).otherwise(0L)).as("n_match"),
        sum(when(col("pass_bloom") && col("is_match").isNull, 1L)
          .otherwise(0L)).as("n_false_pos"))
      .orderBy("o_orderstatus")
  }

  /** Z-order (Morton) clustering key: interleave the low 8 bits of two
    * dimensions (customer key, order day-of-year) into one sort key, and
    * report per 1024-wide z-range the row count and the bounding box of
    * both source dimensions. Tight boxes are the point: data written in
    * z order gives every file/row-group a small min/max rectangle in
    * BOTH dimensions, so a predicate on either one prunes — the
    * multi-dimensional generalization of sort-by-one-column data
    * skipping (what Delta/Iceberg OPTIMIZE ZORDER does).
    *
    * Scale shape: the z value is pure per-row bit arithmetic (codegen,
    * no shuffle); the range summary is one hash aggregation on a
    * 64-value key.
    */
  def qZorder(spark: SparkSession, dir: String): DataFrame = {
    def interleave(x: String, y: String): String =
      (0 until 8).map { i =>
        s"(((($x) >> $i) & 1) << ${2 * i}) + (((($y) >> $i) & 1) << ${2 * i + 1})"
      }.mkString(" + ")
    val z = interleave("o_custkey % 256", "doy % 256")
    t(spark, dir, "orders")
      .select(col("o_custkey"),
        dayofyear(col("o_orderdate")).cast("long").as("doy"))
      .withColumn("z", expr(z))
      .withColumn("z_range", (col("z") / 1024).cast("long"))
      .groupBy("z_range")
      .agg(count(lit(1)).as("n"),
        min(col("o_custkey") % 256).as("min_x"),
        max(col("o_custkey") % 256).as("max_x"),
        min(col("doy") % 256).as("min_y"),
        max(col("doy") % 256).as("max_y"))
      .orderBy("z_range")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cms_heavy" -> qCmsHeavy _,
    "q_bloom_join" -> qBloomJoin _,
    "q_zorder" -> qZorder _)

  val oracles: Map[String, String] = Map(
    "q_cms_heavy" -> {
      val w = 512
      val rowSel = (0 until 4).map { i =>
        val (a, c) = params(i)
        s"SELECT term, cnt, $i AS h, ((b * $a + $c) % $M61) % $w AS bucket FROM tok"
      }.mkString("\n        UNION ALL\n        ")
      s"""
      WITH tok AS (
        SELECT term, count(*) AS cnt, ${sqlBase32("term")} AS b
        FROM (
          SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
            x -> x != '')) AS term
          FROM documents)
        GROUP BY term
      ),
      hashed AS (
        $rowSel
      ),
      cells AS (
        SELECT h, bucket, CAST(sum(cnt) AS BIGINT) AS cell
        FROM hashed GROUP BY h, bucket
      ),
      top AS (
        SELECT term, cnt FROM tok ORDER BY cnt DESC, term LIMIT 20
      )
      SELECT t.term, min(t.cnt) AS exact_cnt, min(c.cell) AS cms_cnt,
             min(c.cell) - min(t.cnt) AS overcount
      FROM top t
      JOIN hashed hx ON t.term = hx.term
      JOIN cells c ON hx.h = c.h AND hx.bucket = c.bucket
      GROUP BY t.term
      ORDER BY exact_cnt DESC, t.term"""
    },
    "q_bloom_join" -> {
      val m = 8192
      def pos(i: Int, h: String): String = {
        val (a, c) = params(4 + i)
        s"(($h * $a + $c) % $M61) % $m"
      }
      s"""
      WITH dim AS (
        SELECT c_custkey AS custkey FROM customer
        WHERE c_mktsegment = 'BUILDING'
      ),
      bits AS (
        SELECT list(DISTINCT pos) AS bits FROM (
          ${(0 until 3).map(i =>
            s"SELECT ${pos(i, sqlBase32("CAST(custkey AS VARCHAR)"))} AS pos FROM dim")
            .mkString("\n          UNION ALL\n          ")})
      ),
      probed AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               ${(0 until 3).map(i =>
                 s"list_contains(bits, ${pos(i, sqlBase32("CAST(o_custkey AS VARCHAR)"))})")
                 .mkString(" AND ")} AS pass_bloom
        FROM orders CROSS JOIN bits
      )
      SELECT o_orderstatus, count(*) AS n_orders,
             CAST(sum(CASE WHEN pass_bloom THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pass_bloom,
             CAST(sum(CASE WHEN d.custkey IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_match,
             CAST(sum(CASE WHEN pass_bloom AND d.custkey IS NULL THEN 1
               ELSE 0 END) AS BIGINT) AS n_false_pos
      FROM probed LEFT JOIN dim d ON o_custkey = d.custkey
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""
    },
    "q_zorder" -> {
      val z = (0 until 8).map { i =>
        s"((((o_custkey % 256) >> $i) & 1) << ${2 * i}) + " +
          s"((((doy % 256) >> $i) & 1) << ${2 * i + 1})"
      }.mkString(" + ")
      s"""
      WITH d AS (
        SELECT o_custkey, CAST(dayofyear(o_orderdate) AS BIGINT) AS doy
        FROM orders
      ),
      zd AS (
        SELECT o_custkey, doy, ($z) // 1024 AS z_range FROM d
      )
      SELECT z_range, count(*) AS n,
             min(o_custkey % 256) AS min_x, max(o_custkey % 256) AS max_x,
             min(doy % 256) AS min_y, max(doy % 256) AS max_y
      FROM zd GROUP BY z_range ORDER BY z_range"""
    })
}
