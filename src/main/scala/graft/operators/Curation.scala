package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators: the selection/mixing stage of a
  * training-data pipeline (driver-mandated §2e scope — after dedup and
  * quality scoring, a pretraining run picks documents to a token budget
  * and a source mixture). All deterministic and oracle-checked.
  *
  * Scale: budget selection is one window over a quality ordering (one
  * shuffle); at 100 TB the same result comes from quality-bucket
  * histograms + a threshold, but the windowed form is the semantics.
  */
object Curation extends QueryPack {

  /** Token-budget selection: rank documents by a quality ordering and
    * keep documents while the cumulative token count stays within the
    * budget (greedy prefix — the standard corpus-budget rule).
    *
    * The cumulative sum is the distributed prefix sum of
    * [[withRunningSums]] with a single constant key — ONE balanced
    * range shuffle on the quality order plus broadcast per-partition
    * offsets — not a global `Window.orderBy` (which moves the whole
    * table to ONE partition — the thing that cannot work at 100 TB).
    * This replaced an earlier hand-rolled fixed-width value bucketing:
    * the range partitioner balances the prefix whatever the quality
    * distribution, where fixed buckets skew with it. Long sums are
    * exact, so the result is bitwise the global window the oracle runs.
    */
  def txTokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val budget = 10000L
    val toks = TextAnalysis.tokens(col("text"))
    val scored = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(toks).cast("long").as("n_tokens"),
        (length(col("text")) - size(toks)).cast("long").as("quality_key"))
      // higher quality first: ascending (−quality, doc_id)
      .withColumn("__ord",
        struct((-col("quality_key")).as("nq"), col("doc_id")))
      .withColumn("__k", lit(0))
    withRunningSums(scored, "__k", "__ord", "__rn", "__n",
      Seq("cum_tokens" -> "n_tokens"))
      .filter(col("cum_tokens") <= budget)
      .select("doc_id", "lang", "n_tokens", "cum_tokens")
      .orderBy("doc_id")
  }

  /** Source-mixture selection: per-source quotas (a fixed mixing recipe
    * like "40% src0, 30% src1, …" scaled to a target count), filled
    * deterministically by doc_id rank within each source.
    */
  def txMixture(spark: SparkSession, dir: String): DataFrame = {
    val quotas = Map("src0" -> 40L, "src1" -> 30L, "src2" -> 20L,
      "src3" -> 10L)
    val quotaCol = quotas.foldLeft(lit(0L)) { case (acc, (s, q)) =>
      when(col("source") === s, q).otherwise(acc)
    }
    // per-source positions via the window-free prefix-rank idiom (a
    // source-keyed window over raw documents is one corpus-sized
    // partition per source at scale); doc_id unique → exact row_number
    withRankBy(
      t(spark, dir, "documents").select(col("doc_id"), col("source")),
      "source", "doc_id", "rank_in_source", "__n")
      .drop("__n")
      .filter(col("rank_in_source") <= quotaCol)
      .orderBy("doc_id")
  }

  /** Stratified sample per language — deterministic systematic sampling
    * (every k-th document by id rank within each stratum, k = 2 for en,
    * 5 otherwise ≈ the 0.5/0.2 fractions). Replaces the round-1 seeded
    * `sampleBy` (Bernoulli, engine-deterministic but not SQL-portable):
    * systematic sampling gives the same stratum fractions AND an exact
    * DuckDB oracle. The Bernoulli path stays covered by CurationSpec.
    */
  def txSampleStratified(spark: SparkSession, dir: String): DataFrame = {
    // per-lang positions via the window-free prefix-rank idiom (a
    // lang-keyed window is one partition per language — corpus-sized
    // at 100 TB); doc_id is unique, so ranks match row_number exactly
    withRankBy(
      t(spark, dir, "documents").select(col("doc_id"), col("lang")),
      "lang", "doc_id", "rn", "n")
      .filter(col("rn") % when(col("lang") === "en", 2).otherwise(5) === 1)
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** Document-length percentiles per language: exact interpolated p50/p90
    * via the textbook rank formula (idx = 1 + p·(n−1), linear
    * interpolation between the two bracketing order statistics), written
    * so both engines evaluate the identical double expression → bitwise
    * oracle parity. The `percentile_approx` sketch (the 100 TB one-pass
    * path) rides along as a CONTRACT check: its p50 must land within 5%
    * of the exact value (oracle emits `true`).
    *
    * Scale: ranks come from [[withRankBy]] — one balanced range
    * shuffle, never a one-partition-per-language window; the sketch
    * column shows the mergeable one-pass alternative for when even
    * exact rank selection is not worth a shuffle.
    */
  def txLengthPercentiles(spark: SparkSession, dir: String): DataFrame = {
    // per-lang ranks via the window-free prefix-rank idiom (a lang-
    // keyed window is one partition per language — corpus-sized at
    // 100 TB); withRankBy also carries the per-key count `n`
    val d = withRankBy(
      t(spark, dir, "documents").select(col("lang"), col("n_chars")),
      "lang", "n_chars", "rn", "n")
    def idx(p: Double) = lit(1.0) + lit(p) * (col("n") - 1).cast("double")
    def pc(p: Double, tag: String) = Seq(
      max(when(col("rn") === floor(idx(p)).cast("long"), col("n_chars")))
        .as(s"vlo_$tag"),
      max(when(col("rn") === floor(idx(p)).cast("long") + 1, col("n_chars")))
        .as(s"vhi_$tag"),
      max(idx(p) - floor(idx(p))).as(s"frac_$tag"))
    def interp(tag: String) =
      col(s"vlo_$tag").cast("double") +
        (coalesce(col(s"vhi_$tag"), col(s"vlo_$tag")).cast("double") -
          col(s"vlo_$tag").cast("double")) * col(s"frac_$tag")
    val aggs = pc(0.5, "50") ++ pc(0.9, "90") ++ Seq(
      percentile_approx(col("n_chars"), lit(0.5), lit(1000))
        .cast("double").as("approx50"),
      min(col("n_chars")).as("min_chars"),
      max(col("n_chars")).as("max_chars"))
    d.groupBy("lang")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("lang"),
        interp("50").as("p50"),
        interp("90").as("p90"),
        (abs(col("approx50") - interp("50")) / interp("50") <= 0.05)
          .as("approx_p50_ok"),
        col("min_chars"), col("max_chars"))
      .orderBy("lang")
  }

  /** Temperature-based source resampling (α = 0.5): per-source quotas
    * ∝ n_s^α normalized across sources — the standard mixing rule that
    * upweights small sources relative to proportional sampling (α=1) —
    * then a deterministic take of the lowest-id docs per source up to
    * the quota. n^0.5 is written as sqrt(), which IEEE-754 requires to
    * be correctly rounded, so the quota arithmetic is bitwise portable
    * (pow(x, 0.5) would not be); floor() keeps the cutoff exact.
    *
    * Scale: one count per source (tiny), quotas broadcast, selection
    * by [[withRankBy]] positions — the same shape as
    * [[txSampleStratified]] with data-derived fractions.
    */
  def txSampleTemperature(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val sampleN = 200
    val d = t(spark, dir, "documents").select(col("doc_id"), col("source"))
    val counts = d.groupBy("source").agg(count(lit(1)).as("n"))
    // Σ√n sums as DECIMAL(28,12): double summation order differs between
    // engines (and DuckDB's window frames aggregate pairwise), while the
    // decimal sum of identically-rounded terms is exact and commutative
    val tot = counts.agg(
      sum(sqrt(col("n").cast("double")).cast(DecimalType(28, 12)))
        .cast("double").as("z"))
    val quotas = counts.crossJoin(broadcast(tot))
      .withColumn("quota",
        floor(lit(sampleN.toDouble) * sqrt(col("n").cast("double")) /
          col("z")).cast("long"))
      .select("source", "n", "quota")
    // per-source positions via the window-free prefix-rank idiom
    // (doc_id unique → exact row_number; see txMixture)
    withRankBy(d, "source", "doc_id", "rank", "__n")
      .join(broadcast(quotas), "source")
      .filter(col("rank") <= col("quota"))
      .select("doc_id", "source", "rank")
      .orderBy("doc_id")
  }

  /** Weighted reservoir sample (A-Res, Efraimidis–Spirakis): each doc
    * gets priority u^(1/w) — u a deterministic md5-derived uniform in
    * (0,1), w = n_chars — and the sample is the global top-100 by
    * priority. Long documents are proportionally likelier to be drawn,
    * and the whole draw is one top-k (TakeOrderedAndProject: per-
    * partition heaps + a driver merge of 100-row heads — no global
    * sort, the property that makes A-Res THE distributed weighted
    * sampler). Ranking uses ln(u)/w (monotone in u^(1/w)) rounded to 6
    * decimals with a doc_id tiebreak, the repo's standard recipe for
    * cross-engine float ordering.
    */
  def txSampleWeighted(spark: SparkSession, dir: String): DataFrame = {
    val u = "(CAST(conv(substr(md5(CAST(doc_id AS STRING)),1,8),16,10) " +
      "AS BIGINT) + 0.5) / 4294967296.0"
    t(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("priority",
        round(expr(s"ln($u)") / col("n_chars").cast("double"), 6))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(100)
      .orderBy("doc_id")
  }

  /** Deterministic epoch shuffle + shard assignment — the EXPORT step a
    * training run performs on the curated corpus. A 100 TB corpus
    * cannot be Fisher–Yates shuffled, so production loaders order by a
    * seeded keyed hash and split that order into S shards, each written
    * hash-sorted: streaming the shards back is a reproducible
    * pseudo-random permutation of the corpus, and a new epoch seed
    * re-permutes everything with zero state. `shard = h % S` balances
    * shards to ±O(√(N/S)) with no coordination; `pos` is the written
    * offset within the shard.
    *
    * Scale: one codegen'd hash pass (native [[graft.functions.Md5Prefix]]
    * straight off the digest bytes), ONE shuffle keyed on shard, and an
    * in-partition sort per shard — S is chosen so a shard fits an
    * executor (at 100 TB, S ≈ corpus/256 MB), which is exactly the sort
    * the export writer performs anyway. No global sort, no driver
    * state. Fully oracle-checked: the hash is the repo's portable
    * md5-prefix BIGINT family.
    */
  def cuShuffleShard(spark: SparkSession, dir: String): DataFrame =
    shuffleShard(t(spark, dir, "documents").select(col("doc_id")),
      "ep1", 8)

  /** The epoch-shuffle kernel over any keyed frame — seed and shard
    * count parameterized so ShuffleShardSpec can pin the permutation /
    * balance / re-seed properties the SQL oracle cannot express. */
  private[graft] def shuffleShard(docs: DataFrame, seed: String,
      shards: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val byShard = Window.partitionBy("shard").orderBy("k", "doc_id")
    docs
      .withColumn("k", expr(
        s"graft_md5_prefix(concat('$seed:', CAST(doc_id AS STRING)), 15)"))
      .withColumn("shard", pmod(col("k"), lit(shards)).cast("long"))
      .withColumn("pos", row_number().over(byShard).cast("long"))
      .select("doc_id", "shard", "pos")
      .orderBy("shard", "pos")
  }

  /** The export WRITER form of [[cuShuffleShard]] — materialize an
    * epoch's shuffle through the A-layer as a `partition_by = shard`
    * model: one directory per shard on disk, one task (hence one
    * pos-ordered file) per shard, written under a versioned dir and
    * published by the registry's atomic pointer swap. This is the
    * artifact a training loader actually streams: read the shard
    * directories in order and the corpus arrives as a reproducible
    * pseudo-random permutation; re-running with the next epoch's seed
    * re-exports under a new version without disturbing readers of the
    * current one. Readers filtering on `shard` get directory pruning
    * (PartitionFilters), so a loader resuming mid-epoch opens only the
    * shards it still needs.
    */
  def shardToModel(api: graft.api.FalApi, dir: String,
      seed: String = "ep1", shards: Int = 8,
      name: String = "documents_shards"): graft.api.WriteResult = {
    import graft.api.{ModelDef, ModelKind}
    if (api.registry.modelOpt(name).isEmpty)
      api.registry.register(ModelDef(name, ModelKind.Sql("shard export"),
        meta = Map("partition_by" -> "shard")))
    api.writeToModel(
      shuffleShard(t(api.spark, dir, "documents").select(col("doc_id")),
          seed, shards)
        .repartition(shards, col("shard"))
        .sortWithinPartitions("shard", "pos"),
      name)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cu_shuffle_shard" -> cuShuffleShard _,
    "tx_token_budget" -> txTokenBudget _,
    "tx_mixture" -> txMixture _,
    "tx_sample_stratified" -> txSampleStratified _,
    "tx_sample_temperature" -> txSampleTemperature _,
    "tx_sample_weighted" -> txSampleWeighted _,
    "tx_length_percentiles" -> txLengthPercentiles _)

  val oracles: Map[String, String] = Map(
    "cu_shuffle_shard" -> """
      WITH hashed AS (
        SELECT doc_id,
               CAST(concat('0x',
                 substr(md5('ep1:' || CAST(doc_id AS VARCHAR)), 1, 15))
                 AS BIGINT) AS k
        FROM documents
      )
      SELECT doc_id, k % 8 AS shard,
             row_number() OVER (PARTITION BY k % 8 ORDER BY k, doc_id)
               AS pos
      FROM hashed
      ORDER BY shard, pos""",
    "tx_sample_weighted" -> """
      SELECT doc_id, source, n_chars, priority FROM (
        SELECT doc_id, source, n_chars,
               round(ln((CAST(concat('0x',
                   substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                   + 0.5) / 4294967296.0)
                 / CAST(n_chars AS DOUBLE), 6) AS priority
        FROM documents
        ORDER BY priority DESC, doc_id LIMIT 100
      ) ORDER BY doc_id""",
    "tx_sample_temperature" -> """
      WITH counts AS (
        SELECT source, count(*) AS n FROM documents GROUP BY source
      ),
      tot AS (
        SELECT CAST(sum(CAST(sqrt(CAST(n AS DOUBLE)) AS DECIMAL(28,12)))
          AS DOUBLE) AS z
        FROM counts
      ),
      quotas AS (
        SELECT source,
               CAST(floor(200.0 * sqrt(CAST(n AS DOUBLE)) / z) AS BIGINT)
                 AS quota
        FROM counts CROSS JOIN tot
      ),
      ranked AS (
        SELECT doc_id, source,
               CAST(row_number() OVER
                 (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS rank
        FROM documents
      )
      SELECT doc_id, source, rank
      FROM ranked JOIN quotas USING (source)
      WHERE rank <= quota
      ORDER BY doc_id""",
    "tx_token_budget" -> """
      WITH scored AS (
        SELECT doc_id, lang,
               CAST(len(list_filter(string_split_regex(text, '\s+'),
                 w -> w != '')) AS BIGINT) AS n_tokens,
               CAST(length(text) - len(list_filter(
                 string_split_regex(text, '\s+'), w -> w != ''))
                 AS BIGINT) AS quality_key
        FROM documents
      )
      SELECT doc_id, lang, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY quality_key DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_tokens
      FROM scored
      QUALIFY cum_tokens <= 10000
      ORDER BY doc_id""",
    "tx_mixture" -> """
      SELECT doc_id, source, rank_in_source FROM (
        SELECT doc_id, source,
               CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
                 AS BIGINT) AS rank_in_source
        FROM documents
      )
      WHERE rank_in_source <= CASE source
        WHEN 'src0' THEN 40 WHEN 'src1' THEN 30
        WHEN 'src2' THEN 20 WHEN 'src3' THEN 10 ELSE 0 END
      ORDER BY doc_id""",
    "tx_sample_stratified" -> """
      SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        FROM documents
      )
      WHERE rn % (CASE WHEN lang = 'en' THEN 2 ELSE 5 END) = 1
      ORDER BY doc_id""",
    "tx_length_percentiles" -> {
      def idx(p: String) = s"1.0 + $p * CAST(n - 1 AS DOUBLE)"
      def g(p: String, tag: String) = s"""
        max(CASE WHEN rn = CAST(floor(${idx(p)}) AS BIGINT)
          THEN n_chars END) AS vlo_$tag,
        max(CASE WHEN rn = CAST(floor(${idx(p)}) AS BIGINT) + 1
          THEN n_chars END) AS vhi_$tag,
        max(${idx(p)} - floor(${idx(p)})) AS frac_$tag"""
      def interp(tag: String) =
        s"""CAST(vlo_$tag AS DOUBLE) +
          (CAST(coalesce(vhi_$tag, vlo_$tag) AS DOUBLE) -
           CAST(vlo_$tag AS DOUBLE)) * frac_$tag"""
      s"""
      WITH d AS (
        SELECT lang, n_chars,
               row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn
        FROM documents
      ),
      c AS (SELECT lang, count(*) AS n FROM d GROUP BY lang),
      g AS (
        SELECT d.lang, ${g("0.5", "50")}, ${g("0.9", "90")},
               min(n_chars) AS min_chars, max(n_chars) AS max_chars
        FROM d JOIN c ON d.lang = c.lang GROUP BY d.lang
      )
      SELECT lang,
             ${interp("50")} AS p50,
             ${interp("90")} AS p90,
             true AS approx_p50_ok,
             min_chars, max_chars
      FROM g ORDER BY lang"""
    })
}
