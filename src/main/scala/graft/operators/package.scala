package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

package object operators {

  /** A named set of queries plus their DuckDB oracle SQL (SURVEY.md §5:
    * every declared operator needs both). Oracle keys must be a subset of
    * query keys; queries without an oracle get the driver's weaker
    * rows-only check.
    */
  trait QueryPack {
    def queries: Map[String, (SparkSession, String) => DataFrame]
    def oracles: Map[String, String]
  }

  /** Exact-arithmetic helpers for oracle parity.
    *
    * Double aggregation is order-dependent, and Spark and DuckDB reduce in
    * different orders, so `sum(double)` can never hash-match. Casting each
    * term to a decimal makes the sum exact and associative; casting the
    * exact result back to double yields the same IEEE double in both
    * engines. Per-row arithmetic (`a * b`) stays in double — identical
    * operand bits give identical result bits in both engines.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** Exact average: exact decimal sum divided by count, both as doubles —
    * one double division, identical in both engines.
    */
  def davg(c: Column): Column = dsum(c) / count(c).cast(DoubleType)

  /** Cosine-similarity clamp to [-1, 1]. The raw quotient
    * `dot/(‖a‖·‖b‖)` lands 1 ulp OUTSIDE the interval on
    * (near-)identical vector pairs; DuckDB's list_cosine_similarity
    * clamps (verified empirically: it is exactly
    * `clamp(dot/(sqrt(na)*sqrt(nb)), -1, 1)` on sequential-fold
    * accumulators), and the clamp is also what downstream thresholds
    * (`> 0.95` near-dup cuts) want — a mathematical cosine never
    * exceeds 1.
    */
  def clampCos(c: Column): Column =
    greatest(lit(-1.0), least(lit(1.0), c))

  /** DuckDB twin of [[dsum]]. */
  def sqlDsum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(18,4))) AS DOUBLE)"

  /** DuckDB twin of [[davg]]. */
  def sqlDavg(expr: String): String =
    s"(${sqlDsum(expr)} / CAST(COUNT($expr) AS DOUBLE))"

  /** Integer-valued computed outputs are emitted as long in Spark to match
    * DuckDB's BIGINT-typed functions (year(), count(), etc.).
    */
  def asLong(c: Column): Column = c.cast(LongType)

  /** Order-independent exact sum for unit-scale doubles (log terms,
    * deviations, embedding components): round to 9 decimals — engines
    * agree there to ~1e-15 — then sum exactly in a wide decimal.
    * [[dsum]]'s DECIMAL(18,4) is for money-scale exact inputs; this is
    * the variant for computed doubles that need finer scale.
    */
  def lsum(c: Column): Column =
    sum(round(c, 9).cast("decimal(28,12)")).cast(DoubleType)

  /** DuckDB twin of [[lsum]]. */
  def sqlLsum(expr: String): String =
    s"CAST(SUM(CAST(round($expr, 9) AS DECIMAL(28,12))) AS DOUBLE)"

  /** Least-squares slope from sufficient statistics (n, Σx, Σy, Σxx,
    * Σxy) — shared so the regression algebra exists once per engine.
    */
  def olsSlope(n: Column, sx: Column, sy: Column, sxx: Column,
      sxy: Column): Column =
    (n.cast(DoubleType) * sxy - sx * sy) /
      (n.cast(DoubleType) * sxx - sx * sx)

  /** Least-squares intercept (uses [[olsSlope]] inline, mirroring the
    * SQL twin's textual expansion).
    */
  def olsIntercept(n: Column, sx: Column, sy: Column, sxx: Column,
      sxy: Column): Column =
    (sy - sx * olsSlope(n, sx, sy, sxx, sxy)) / n.cast(DoubleType)

  /** DuckDB twin of [[olsSlope]] over column names. */
  def sqlOlsSlope(n: String, sx: String, sy: String, sxx: String,
      sxy: String): String =
    s"(CAST($n AS DOUBLE) * $sxy - $sx * $sy) / " +
      s"(CAST($n AS DOUBLE) * $sxx - $sx * $sx)"

  /** DuckDB twin of [[olsIntercept]]. */
  def sqlOlsIntercept(n: String, sx: String, sy: String, sxx: String,
      sxy: String): String =
    s"($sy - $sx * ${sqlOlsSlope(n, sx, sy, sxx, sxy)}) / " +
      s"CAST($n AS DOUBLE)"

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Sequential-fold double dot product over two float vectors — same
    * accumulation order as DuckDB's list_dot_product on DOUBLE[], so the
    * result is bitwise identical (verified empirically).
    */
  def dotCol(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine via dot/(√·√) — the exact formula DuckDB's
    * list_cosine_similarity uses, for bitwise oracle parity.
    */
  def cosineCol(a: Column, b: Column): Column =
    dotCol(a, b) / (sqrt(dotCol(a, a)) * sqrt(dotCol(b, b)))

  /** Exact per-key value ranks WITHOUT a keyed window — the
    * two-phase prefix-sum idiom of [[withGlobalNtile]] generalized to
    * per-key ranks (the keyed-window form holds one partition per key,
    * which for per-document rows keyed by e.g. language is billions of
    * rows per partition at 100 TB):
    *
    *  1. ONE range shuffle on (key, value) + in-partition sort — a
    *     key's rows land in contiguous partitions in value order;
    *  2. in-partition ordinals from `monotonically_increasing_id`'s
    *     low 33 bits;
    *  3. a tiny (partition, key) stats table — row count, first
    *     ordinal — self-joined per key (broadcast hash, O(P·K) rows)
    *     gives each (partition, key) its strictly-before row total,
    *     the per-key total N, and the ordinal base;
    *  4. rank = offset + (ordinal − base) + 1, map-side.
    *
    * Ranks among equal (key, value) rows are assignment-arbitrary but
    * the VALUE at any rank is deterministic — exactly what rank-k
    * selections (medians, percentiles) consume. Adds `rankCol` and
    * `nCol` (per-key row count). NULL keys form an ordinary group
    * (the joins below are null-safe), matching the keyed-window
    * formulations these helpers replace.
    */
  def withRankBy(df: DataFrame, key: String, valueCol: String,
      rankCol: String, nCol: String): DataFrame = {
    val parts = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    val parted = df.repartitionByRange(parts, col(key), col(valueCol))
      .sortWithinPartitions(col(key), col(valueCol))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mord",
        monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)))
      .cache()
    val c = parted.groupBy(col("__pid"), col(key).as("__k"))
      .agg(count(lit(1)).as("__cnt"), min(col("__mord")).as("__base"))
    val stats = c.as("x")
      .join(broadcast(c.as("y")), col("x.__k") <=> col("y.__k"))
      .groupBy(col("x.__pid").as("__spid"), col("x.__k").as("__k"))
      .agg(
        sum(when(col("y.__pid") < col("x.__pid"), col("y.__cnt"))
          .otherwise(0L)).as("__off"),
        sum(col("y.__cnt")).as(nCol),
        min(col("x.__base")).as("__base"))
    parted.join(broadcast(stats),
        parted("__pid") === stats("__spid") &&
          parted(key) <=> stats("__k"))
      .withColumn(rankCol,
        col("__off") + (col("__mord") - col("__base")) + lit(1L))
      .drop("__pid", "__spid", "__k", "__mord", "__off", "__base")
  }

  /** [[withRankBy]] extended with inclusive running (prefix) sums: per
    * `key` in `valueCol` order, adds `rankCol`, `nCol`, and for each
    * `(outCol, inCol)` of `sumCols` the prefix sum of `inCol` up to and
    * including the current row. The keyed-window form of a running sum
    * holds one partition per key; here the order comes from ONE
    * balanced range shuffle, in-partition running sums are windowed by
    * (partition, key) — bounded by the range partition size, never by
    * key population — and a broadcast (partition, key) stats table
    * supplies the strictly-before offsets for ranks and sums alike.
    * `sumCols` inputs must be exactly summable (decimal/long) so
    * offset + in-partition prefix is bitwise the global prefix. On a
    * unique (key, value) order the prefix at every row is
    * deterministic; among tied rows it is assignment-arbitrary (the
    * same caveat as [[withRankBy]] ranks) — order on a tiebroken
    * struct when rows can collide.
    */
  def withRunningSums(df: DataFrame, key: String, valueCol: String,
      rankCol: String, nCol: String,
      sumCols: Seq[(String, String)]): DataFrame =
    runningSumsCore(df, key, valueCol, rankCol, nCol, sumCols, 0)

  /** [[withRunningSums]] plus, for every sum column `S`, a lagged twin
    * `<S>_lag` = the global inclusive prefix at rank − `lagOffset`
    * (null when rank ≤ `lagOffset`) — the pair a bounded sliding frame
    * needs (`frame sum over (rank−1−w, rank−1] = (S − own) − S_lag`)
    * WITHOUT the corpus×corpus (key, rank − w) self-join d3_anomaly
    * used to pay (VERDICT r9 item #4: two extra full hash exchanges,
    * 8.5 s of the sf1 probe). The lag rides the SAME in-partition
    * window pass (ranks are contiguous within a range partition, so
    * rank − w lives in-partition for every row past the first w of its
    * partition), and only the ≤ `lagOffset`·P·K partition-boundary
    * rows resolve through two BROADCAST lookups over the cached
    * layout — no additional exchange at any size.
    */
  def withLaggedRunningSums(df: DataFrame, key: String, valueCol: String,
      rankCol: String, nCol: String, sumCols: Seq[(String, String)],
      lagOffset: Int): DataFrame = {
    require(lagOffset > 0, "lagOffset must be positive")
    runningSumsCore(df, key, valueCol, rankCol, nCol, sumCols, lagOffset)
  }

  private def runningSumsCore(df: DataFrame, key: String,
      valueCol: String, rankCol: String, nCol: String,
      sumCols: Seq[(String, String)], lagOffset: Int): DataFrame = {
    val parts = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    val parted = df.repartitionByRange(parts, col(key), col(valueCol))
      .sortWithinPartitions(col(key), col(valueCol))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mord",
        monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)))
      .cache()
    val inPart = Window.partitionBy(col("__pid"), col(key))
      .orderBy(col("__mord"))
    val inPartFrame = inPart
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run0 = sumCols.foldLeft(parted) { case (d, (out, in)) =>
      d.withColumn(out, sum(col(in)).over(inPartFrame))
    }
    // in-partition lag of the LOCAL prefix; rides the same window sort
    val run = if (lagOffset == 0) run0
      else sumCols.foldLeft(run0) { case (d, (out, _)) =>
        d.withColumn(s"__il_$out", lag(col(out), lagOffset).over(inPart))
      }
    val cAggs = Seq(count(lit(1)).as("__cnt"),
      min(col("__mord")).as("__base")) ++
      sumCols.map { case (out, in) => sum(col(in)).as(s"__t_$out") }
    val c = parted.groupBy(col("__pid"), col(key).as("__k"))
      .agg(cAggs.head, cAggs.tail: _*)
    val before = (x: String) =>
      when(col("y.__pid") < col("x.__pid"), col(s"y.$x")).otherwise(lit(0L))
    val sAggs = Seq(sum(before("__cnt")).as("__off"),
      sum(col("y.__cnt")).as(nCol),
      min(col("x.__base")).as("__base")) ++
      sumCols.map { case (out, _) =>
        sum(before(s"__t_$out")).as(s"__o_$out") }
    val stats = c.as("x")
      .join(broadcast(c.as("y")), col("x.__k") <=> col("y.__k"))
      .groupBy(col("x.__pid").as("__spid"), col("x.__k").as("__k"))
      .agg(sAggs.head, sAggs.tail: _*)
    val globals0 = sumCols.foldLeft(
      run.join(broadcast(stats),
          run("__pid") === stats("__spid") && run(key) <=> stats("__k"))
        .withColumn(rankCol,
          col("__off") + (col("__mord") - col("__base")) + lit(1L))) {
        case (d, (out, _)) =>
          // globalize BOTH the prefix and (when lagging) its
          // in-partition lag — a row whose lag target is in-partition
          // shares the target's partition offset
          val g = d.withColumn(out, col(s"__o_$out") + col(out))
          if (lagOffset == 0) g.drop(s"__o_$out")
          else g.withColumn(s"${out}_lag",
            col(s"__o_$out") + col(s"__il_$out"))
            .drop(s"__o_$out", s"__il_$out")
      }
    // the boundary resolution references the globalized frame three
    // times (consumer scan, lookup probe, final join); uncached, each
    // reference re-pays the window's hash exchange + sort — cache it
    // so they are plain scans (measured sf1: 15 s uncached vs the
    // cached form's sub-r9 time)
    val globals = if (lagOffset == 0) globals0 else globals0.cache()
    val resolved = if (lagOffset == 0) globals else {
      // boundary rows (in-partition ordinal ≤ lagOffset but global
      // rank past it) read their target from an EARLIER partition:
      // at most lagOffset·P rows per key — broadcast the consumers
      // against the cached layout, then broadcast the found targets
      // back. No exchange either way.
      val q = col(rankCol) - col("__off")
      val consumers = globals
        .filter(q <= lagOffset && col(rankCol) > lagOffset)
        .select(col(key).as("__bk"),
          (col(rankCol) - lagOffset).as("__brn"))
      val lookup = globals
        .join(broadcast(consumers),
          col(key) <=> col("__bk") && col(rankCol) === col("__brn"))
        .select(Seq(col("__bk"), (col(rankCol) + lagOffset).as("__crn")) ++
          sumCols.map { case (out, _) => col(out).as(s"__b_$out") }: _*)
      sumCols.foldLeft(
        globals.join(broadcast(lookup),
          col(key) <=> col("__bk") && col(rankCol) === col("__crn"),
          "left")) { case (d, (out, _)) =>
          d.withColumn(s"${out}_lag",
            coalesce(col(s"${out}_lag"), col(s"__b_$out")))
            .drop(s"__b_$out")
        }
        .drop("__bk", "__crn")
    }
    resolved.drop("__pid", "__spid", "__k", "__mord", "__off", "__base")
  }

  /** Exact interpolated median of `valueCol` per `key` via the rank
    * formula (idx = 1 + 0.5·(n−1)) over [[withRankBy]] ranks — one
    * range shuffle, no keyed window — bitwise-portable against
    * [[sqlMedianByCtes]] (identical selection + interpolation
    * expressions).
    */
  def exactMedianBy(df: DataFrame, key: String, valueCol: String,
      out: String): DataFrame = {
    val ranked = withRankBy(df.select(col(key), col(valueCol)),
      key, valueCol, "__rn", "__n")
    val idx = lit(1.0) + lit(0.5) * (col("__n") - 1).cast(DoubleType)
    ranked
      .filter(col("__rn") === floor(idx).cast(LongType) ||
        col("__rn") === floor(idx).cast(LongType) + 1)
      .groupBy(key)
      .agg(
        max(when(col("__rn") === floor(idx).cast(LongType), col(valueCol)))
          .as("__vlo"),
        max(when(col("__rn") === floor(idx).cast(LongType) + 1,
          col(valueCol))).as("__vhi"),
        max(idx - floor(idx)).as("__frac"))
      .select(col(key),
        (col("__vlo").cast(DoubleType) +
          (coalesce(col("__vhi"), col("__vlo")).cast(DoubleType) -
            col("__vlo").cast(DoubleType)) * col("__frac")).as(out))
  }

  /** Exact global `ntile(k)` over a unique total order WITHOUT a
    * single-partition window — the 100×-scale form of rank bucketing
    * (CCNet terciles, RFM quartiles). Two-phase prefix sum, the
    * txTokenBudget/e7Concurrency idiom applied to ranks:
    *
    *  1. range-partition the rows on the order key (ascending pids
    *     follow the key order) and SORT WITHIN partitions — the only
    *     shuffle in the whole operator;
    *  2. the within-partition ordinal falls out of
    *     `monotonically_increasing_id`'s low 33 bits (the id is
    *     `pid << 33 | rowIndex` in iteration order, which after the
    *     in-partition sort IS the key order) — no window, no second
    *     exchange of the data;
    *  3. a P-row per-partition count table (P = shuffle partitions)
    *     yields, via one broadcast triangular pass, each partition's
    *     strictly-before row total and the grand total N;
    *  4. global rank = offset + ordinal + 1, and the ntile bucket is
    *     pure arithmetic on (rank, N): the first N mod k buckets take
    *     ⌈N/k⌉ rows, the rest ⌊N/k⌋ — bit-identical to
    *     `ntile(k) OVER (ORDER BY …)`, so oracles keep plain ntile.
    *
    * The order columns must form a total order (include a unique
    * tie-break) or the rank is nondeterministic. The range-parted
    * input is cached: the id column must be assigned exactly once, and
    * the frame is consumed twice (counts, then the rank join); callers
    * chain this over entity-sized score tables (one row per
    * document/customer), not the raw corpus. At 100 TB an approximate
    * variant swaps step 3-4 for broadcast `approx_percentile`
    * cut-points; this exact form is what preserves ntile semantics for
    * parity.
    */
  def withGlobalNtile(df: DataFrame, k: Int, bucketCol: String,
      order: Column*): DataFrame = {
    val parts = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    val parted = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__ord",
        monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)))
      .cache()
    val counts = parted.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
    val stats = counts.as("x")
      .join(broadcast(counts.as("y")), lit(true), "inner")
      .groupBy(col("x.__pid").as("__pid"))
      .agg(
        sum(when(col("y.__pid") < col("x.__pid"), col("y.__cnt"))
          .otherwise(0L)).as("__off"),
        sum(col("y.__cnt")).as("__n"))
    val rank = col("__off") + col("__ord") + lit(1L)
    val base = floor(col("__n") / k).cast(LongType)
    val rem = col("__n") % k
    val headRows = rem * (base + lit(1L))
    val bucket = when(col("__rank") <= headRows,
        floor((col("__rank") - 1L) / (base + lit(1L))).cast(LongType) +
          lit(1L))
      .otherwise(rem +
        floor((col("__rank") - headRows - 1L) / base).cast(LongType) +
        lit(1L))
    parted.join(broadcast(stats), Seq("__pid"))
      .withColumn("__rank", rank)
      .withColumn(bucketCol, bucket)
      .drop("__pid", "__ord", "__off", "__n", "__rank")
  }

  /** DuckDB replay of [[exactMedianBy]] over column `v` of CTE `src`
    * keyed by `key`, producing CTEs `<p>c/<p>r/<p>m/<p>med(key, out)`.
    */
  def sqlMedianByCtes(p: String, src: String, key: String, v: String,
      out: String): String = {
    val idx = "1.0 + 0.5 * CAST(n - 1 AS DOUBLE)"
    s"""${p}c AS (SELECT $key, count(*) AS n FROM $src GROUP BY $key),
      ${p}r AS (SELECT $key, $v,
                row_number() OVER (PARTITION BY $key ORDER BY $v) AS rn
              FROM $src),
      ${p}m AS (
        SELECT ${p}r.$key,
               max(CASE WHEN rn = CAST(floor($idx) AS BIGINT)
                 THEN $v END) AS vlo,
               max(CASE WHEN rn = CAST(floor($idx) AS BIGINT) + 1
                 THEN $v END) AS vhi,
               max($idx - floor($idx)) AS frac
        FROM ${p}r JOIN ${p}c ON ${p}r.$key = ${p}c.$key
        GROUP BY ${p}r.$key),
      ${p}med AS (
        SELECT $key,
               CAST(vlo AS DOUBLE) +
                 (CAST(coalesce(vhi, vlo) AS DOUBLE) -
                  CAST(vlo AS DOUBLE)) * frac AS $out
        FROM ${p}m)"""
  }
}
