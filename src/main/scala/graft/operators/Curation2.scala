package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 curation additions: exact-substring duplication profiling
  * (the k-gram form of Lee et al.'s "Deduplicating Training Data Makes
  * Language Models Better" suffix-array pass) and DSIR-style hashed
  * n-gram importance weights (Xie et al., "Data Selection for Language
  * Models via Importance Resampling") — the two selection signals a
  * pretraining pipeline computes after near-dup removal. The reference
  * delegates all per-document scoring to user Python over pandas
  * (`projects/adapter/cli_tests/projects/005_functions_and_variables/
  * fal_scripts/complete_model.py:11-14`); these are the distributed
  * twins of that stage.
  */
object Curation2 extends QueryPack {

  /** DuckDB twin of [[TextAnalysis.tokens]] (same convention as the
    * other packs' local copies).
    */
  private val sqlToks =
    "list_filter(string_split_regex(text, '\\s+'), w -> w != '')"

  /** E5 (completion) — duplicated-span profile: for every document, the
    * fraction of its 10-gram positions whose 10-gram also occurs in
    * some OTHER document. This is the per-doc statistic exact-substring
    * dedup thresholds on (docs with a high duplicated fraction get
    * their spans cut or are dropped wholesale).
    *
    * Scale: one explode to (doc, gram) — map-side, no state; one
    * aggregation keyed on the gram (`min(doc)<>max(doc)` instead of
    * count-distinct keeps the partial aggregate O(1) per key); one
    * semi-join back keyed on the gram; one per-doc count. Every shuffle
    * is on a high-cardinality key, so the plan shards evenly at any
    * corpus size — the suffix-array original is the thing that does
    * NOT distribute, which is why production pipelines use this k-gram
    * reformulation.
    */
  def ddSubstring(spark: SparkSession, dir: String): DataFrame = {
    val k = 10
    val docs = t(spark, dir, "documents")
    val grams = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        explode(when(size(col("w")) >= k,
          transform(sequence(lit(1), size(col("w")) - (k - 1)),
            i => array_join(slice(col("w"), i, lit(k)), " ")))
          .otherwise(array().cast("array<string>"))).as("g"))
      // consumed three times (gram stats, per-doc totals, dup counts)
      .cache()
    val shared = grams.groupBy("g")
      .agg(min(col("doc_id")).as("d0"), max(col("doc_id")).as("d1"))
      .filter(col("d0") =!= col("d1"))
      .select("g")
    val perDoc = grams.groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"))
    val dup = grams.join(shared, Seq("g"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
    docs.select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        // raw integer-operand quotient — no half-way rounding hazard
        (coalesce(col("n_dup"), lit(0L)) /
          nullif(coalesce(col("n_grams"), lit(0L)), lit(0L))
            .cast("double")).as("dup_frac"))
      .orderBy("doc_id")
  }

  /** E9 (completion) — DSIR importance weights over hashed unigrams:
    * target distribution = the `lang = 'en'` slice, raw distribution =
    * the whole corpus; each document's weight is
    * Σ_tokens ln(p_target(bucket)/p_raw(bucket)) with add-one smoothing
    * over 256 md5-prefix hash buckets (the SQL-portable hash family the
    * dedup pack established). Positive weight = more target-like than
    * the corpus average — the resampling key DSIR selects on.
    *
    * Scale: tokens explode once (cached); both distribution tables
    * aggregate to ≤256 rows and broadcast; the per-doc weight is one
    * keyed aggregation. Nothing global, nothing driver-side — the
    * same plan at 100 TB, with only the 256-row λ table collected.
    * Float parity: λ is rounded at 9 decimals, per-doc terms are
    * summed through [[lsum]]'s exact decimal, so the sum is
    * order-independent across engines.
    */
  def txDsir(spark: SparkSession, dir: String): DataFrame = {
    val nBuckets = 256
    // Zero corpus passes: the (doc, term, cnt) rows come from the
    // standing doc_terms model (the canonical tokenize-once layer), so
    // md5 hashes once per DISTINCT (doc, term) pair instead of per
    // token occurrence, and the only wide shuffle is the (doc, bucket)
    // rollup. The distribution table, its totals, and the λ table all
    // derive from that ≤ docs×256-row aggregate. lang rides the model
    // as a passthrough column — no join back to documents.
    val perDocB = TextAnalysis.docTerms(spark, dir)
      .select(col("doc_id"), col("lang"),
        expr("CAST(conv(substr(md5(term),1,4),16,10) AS BIGINT) % 256")
          .as("b"),
        col("cnt"))
      .groupBy("doc_id", "lang", "b")
      .agg(sum(col("cnt")).as("cnt"))
      .cache()
    val dist = perDocB.groupBy("b")
      .agg(sum(col("cnt")).as("raw_cnt"),
        sum(when(col("lang") === "en", col("cnt")).otherwise(0L))
          .as("tgt_cnt"))
    val totals = dist.agg(sum(col("raw_cnt")).as("tot_r"),
      sum(col("tgt_cnt")).as("tot_t"))
    val lam = dist.crossJoin(broadcast(totals))
      .select(col("b"),
        round(
          log((col("tgt_cnt") + 1.0) / (col("tot_t") + nBuckets * 1.0)) -
            log((col("raw_cnt") + 1.0) / (col("tot_r") + nBuckets * 1.0)),
          9).as("lam"))
    perDocB
      .join(broadcast(lam), Seq("b"))
      .groupBy("doc_id")
      .agg(round(lsum(col("cnt").cast("double") * col("lam")), 6)
        .as("dsir_weight"))
      .withColumn("target_like", col("dsir_weight") > 0.0)
      .orderBy("doc_id")
  }

  /** E9 (completion) — deterministic shard + sequence packing: the
    * dataloader-prep stage of a pretraining pipeline. Every document
    * hashes to one of 8 shards (md5 — the SQL-portable family), is
    * ordered within its shard by the same hash (a deterministic global
    * shuffle), and packing is concat-then-chunk: documents concatenate
    * in shard order and sequences cut every 2048 tokens, so a doc's
    * sequence id is its start offset div 2048.
    *
    * Scale: one narrow pass for hash/token counts, then a single keyed
    * window per shard (the running token total). Shards are the unit
    * of parallel writing — more shards, same plan, no global sort.
    */
  def txPack(spark: SparkSession, dir: String): DataFrame = {
    val seqLen = 2048L
    val d = t(spark, dir, "documents")
      .select(col("doc_id"),
        size(graft.operators.TextAnalysis.tokens(col("text")))
          .cast("long").as("n_tok"),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("shard",
        expr("CAST(conv(substr(h,1,4),16,10) AS BIGINT) % 8"))
    val byShard = Window.partitionBy("shard")
      .orderBy(col("h"), col("doc_id"))
    d.withColumn("start_tok",
        coalesce(sum(col("n_tok")).over(
          byShard.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("shard"), col("n_tok"),
        col("start_tok"),
        expr(s"start_tok div $seqLen").as("seq_id"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_substring" -> ddSubstring _,
    "tx_pack" -> txPack _,
    "tx_dsir" -> txDsir _)

  val oracles: Map[String, String] = Map(
    "tx_pack" -> """
      WITH d AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(text, '\s+'),
                 x -> x != '')) AS BIGINT) AS n_tok,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents),
      s AS (
        SELECT doc_id, n_tok,
               CAST(concat('0x', substr(h, 1, 4)) AS BIGINT) % 8 AS shard,
               h
        FROM d),
      packed AS (
        SELECT doc_id, shard, n_tok,
               coalesce(sum(n_tok) OVER (PARTITION BY shard
                 ORDER BY h, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS start_tok
        FROM s)
      SELECT doc_id, shard, n_tok,
             CAST(start_tok AS BIGINT) AS start_tok,
             CAST(start_tok AS BIGINT) // 2048 AS seq_id
      FROM packed ORDER BY doc_id""",
    "dd_substring" -> """
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
      ),
      grams AS (
        SELECT doc_id, array_to_string(w[i:i+9], ' ') AS g
        FROM toks, UNNEST(generate_series(1, len(w)-9)) AS t(i)
        WHERE len(w) >= 10
      ),
      shared AS (
        SELECT g FROM grams GROUP BY g HAVING min(doc_id) <> max(doc_id)
      ),
      per_doc AS (
        SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id
      ),
      dup AS (
        SELECT doc_id, count(*) AS n_dup FROM grams
        WHERE g IN (SELECT g FROM shared) GROUP BY doc_id
      )
      SELECT d.doc_id,
             coalesce(p.n_grams, 0) AS n_grams,
             coalesce(u.n_dup, 0) AS n_dup,
             coalesce(u.n_dup, 0) /
               CAST(nullif(coalesce(p.n_grams, 0), 0) AS DOUBLE)
               AS dup_frac
      FROM documents d
      LEFT JOIN per_doc p USING (doc_id)
      LEFT JOIN dup u USING (doc_id)
      ORDER BY d.doc_id""",
    "tx_dsir" -> s"""
      WITH toks AS (
        SELECT doc_id, lang,
               CAST(concat('0x', substr(md5(w), 1, 4)) AS BIGINT) % 256
                 AS b
        FROM (SELECT doc_id, lang, unnest($sqlToks) AS w FROM documents)
      ),
      totals AS (
        SELECT count(*) AS tot_r,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                 AS BIGINT) AS tot_t
        FROM toks
      ),
      dist AS (
        SELECT b, count(*) AS raw_cnt,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                 AS BIGINT) AS tgt_cnt
        FROM toks GROUP BY b
      ),
      lam AS (
        SELECT b,
               round(ln((tgt_cnt + 1.0) / (tot_t + 256.0)) -
                     ln((raw_cnt + 1.0) / (tot_r + 256.0)), 9) AS lam
        FROM dist, totals
      ),
      per_doc AS (
        SELECT doc_id, b, count(*) AS cnt FROM toks GROUP BY doc_id, b
      )
      SELECT p.doc_id,
             round(${sqlLsum("CAST(p.cnt AS DOUBLE) * l.lam")}, 6)
               AS dsir_weight,
             (round(${sqlLsum("CAST(p.cnt AS DOUBLE) * l.lam")}, 6) > 0.0)
               AS target_like
      FROM per_doc p JOIN lam l USING (b)
      GROUP BY p.doc_id
      ORDER BY p.doc_id""")
}
