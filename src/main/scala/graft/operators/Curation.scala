package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators: the selection/mixing stage of a
  * training-data pipeline (driver-mandated §2e scope — after dedup and
  * quality scoring, a pretraining run picks documents to a token budget
  * and a source mixture). All deterministic; budget/mixture are
  * oracle-checked, sampling is seed-deterministic rows-only.
  *
  * Scale: budget selection is one window over a quality ordering (one
  * shuffle); at 100 TB the same result comes from quality-bucket
  * histograms + a threshold, but the windowed form is the semantics.
  */
object Curation extends QueryPack {

  /** Token-budget selection: rank documents by a quality ordering and
    * keep documents while the cumulative token count stays within the
    * budget (greedy prefix — the standard corpus-budget rule).
    */
  def txTokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val budget = 10000L
    val toks = TextAnalysis.tokens(col("text"))
    val scored = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(toks).cast("long").as("n_tokens"),
        (length(col("text")) - size(toks)).cast("long").as("quality_key"))
    val byQuality = Window.orderBy(col("quality_key").desc, col("doc_id"))
    scored
      .withColumn("cum_tokens",
        sum(col("n_tokens")).over(byQuality
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
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
    val bySource = Window.partitionBy("source").orderBy("doc_id")
    val quotaCol = quotas.foldLeft(lit(0L)) { case (acc, (s, q)) =>
      when(col("source") === s, q).otherwise(acc)
    }
    t(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
      .withColumn("rank_in_source",
        row_number().over(bySource).cast("long"))
      .filter(col("rank_in_source") <= quotaCol)
      .orderBy("doc_id")
  }

  /** Seed-deterministic stratified sample per language (`sampleBy` —
    * the distributed Bernoulli sampler; deterministic for a fixed seed
    * and input layout, not SQL-portable → rows-only check bounded by
    * the exact quota variant above).
    */
  def txSampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val fractions = Map("en" -> 0.5, "es" -> 0.2, "de" -> 0.2,
      "fr" -> 0.2, "zh" -> 0.2)
    t(spark, dir, "documents")
      .stat.sampleBy("lang", fractions, seed = 42L)
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** Approximate percentiles of document length (the sketch path for
    * corpus stats at 100 TB) next to the exact values it approximates —
    * rows-only (sketch internals aren't portable), self-bounded.
    */
  def txLengthPercentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy("lang")
      .agg(
        percentile_approx(col("n_chars"), lit(0.5), lit(1000))
          .cast("long").as("approx_p50"),
        percentile_approx(col("n_chars"), lit(0.9), lit(1000))
          .cast("long").as("approx_p90"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy("lang")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tx_token_budget" -> txTokenBudget _,
    "tx_mixture" -> txMixture _,
    "tx_sample_stratified" -> txSampleStratified _,
    "tx_length_percentiles" -> txLengthPercentiles _)

  val oracles: Map[String, String] = Map(
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
      ORDER BY doc_id""")
}
