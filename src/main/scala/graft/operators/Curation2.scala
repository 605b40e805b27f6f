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

  /** The (doc_id, start, gram-hash) explode of a (doc_id, w:
    * array<string>) relation — the map-side kernel shared by the
    * standing [[gramStarts]] build and [[graft.streaming.StreamScrub]]'s
    * per-micro-batch probe (one kernel ⇒ batch ≡ stream by
    * construction). The gram string dies inside this map stage.
    */
  private[graft] def gramHashes(docs: DataFrame, k: Int = 10)
      : DataFrame = {
    // graft_md5_prefix = the native codegen'd form of the
    // conv(substr(md5(g),1,15),16,10) idiom the oracle replays —
    // identical values, no hex-string round trip per gram occurrence
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .select(col("doc_id"), explode(when(size(col("w")) >= k,
        transform(sequence(lit(1), size(col("w")) - (k - 1)),
          i => struct(i.as("s"),
            array_join(slice(col("w"), i, lit(k)), " ").as("g"))))
        .otherwise(array().cast("array<struct<s:int,g:string>>")))
        .as("sg"))
      .select(col("doc_id"), col("sg.s").as("s"),
        expr("graft_md5_prefix(sg.g, 15)").as("gh"))
  }

  /** The exploded (doc_id, start, gram-hash) relation as a STANDING
    * bucketed model — the compute-at-ingest/probe-many posture the
    * SimHash signatures earned in r10, applied to the exact-substring
    * family (VERDICT r10 item #5). Two design decisions carry the
    * 100 TB posture:
    *
    *   - the ~60-byte 10-gram string dies INSIDE the build's map
    *     stage: it collapses to a 60-bit md5-prefix BIGINT (the
    *     txPack/cuDrift SQL-portable hash family), so the standing
    *     parquet, the doc-freq aggregate, and the dup semi-join all
    *     carry 8-byte keys. The oracle hashes identically, so the gate
    *     stays exact; a 60-bit birthday collision (~10⁻⁸ at sf1's 4M
    *     grams) would merge two grams' doc sets — the standard
    *     accepted-risk trade of hashed substring dedup (Lee et al.
    *     §4 use 64-bit fingerprints the same way);
    *   - the model is BUCKETED on the hash, so every downstream
    *     gram-keyed operation (the `min<>max` doc-freq aggregate, the
    *     duplicated-gram semi-join in BOTH the profile and the scrub)
    *     is bucket-local: the corpus-sized explode shuffles ZERO times
    *     at query time. The explode + md5 are paid once per
    *     (process, corpus) at ingest — the `standing_models` cold
    *     block — not once per query and not twice per scrub (the
    *     un-materialized form recomputed the explode for each of its
    *     two consumers).
    */
  private[graft] def gramStarts(spark: SparkSession, dir: String)
      : DataFrame =
    Shared.model(spark, dir, "gram_starts_10", "gh", { (s, d) =>
      gramHashes(t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w")))
    })

  /** The documents corpus itself, doc_id-bucketed through the A-layer
    * (VERDICT r11 item #4: "bucket the corpus on doc_id at ingest") —
    * the standing form every doc-keyed JOIN-BACK reads: the scrub's
    * reassembly join, [[ddSubstring]]'s profile join. The per-doc
    * aggregates these queries join against are doc_id-keyed shuffle
    * outputs with the same hash partitioning as the bucket spec
    * (buckets = shuffle partitions by construction), so the join plans
    * with ZERO exchange on the corpus side — previously the reassembly
    * leaned on AQE broadcasting a corpus-sized per-doc aggregate,
    * which at 100× falls back to a full corpus exchange. Storage is
    * one bucketed copy of the corpus, paid once at ingest — exactly
    * what "store the corpus bucketed" means in production (the
    * driver's fixture arrives unbucketed, so the engine's ingest
    * materializes it). Guarded by PlanPropertiesSpec's scrub test.
    */
  private[graft] def docsById(spark: SparkSession, dir: String)
      : DataFrame =
    Shared.model(spark, dir, "documents_by_doc", "doc_id",
      (s, d) => t(s, d, "documents"))

  /** E5 (completion) — duplicated-span profile: for every document, the
    * fraction of its 10-gram positions whose 10-gram also occurs in
    * some OTHER document. This is the per-doc statistic exact-substring
    * dedup thresholds on (docs with a high duplicated fraction get
    * their spans cut or are dropped wholesale).
    *
    * Scale: all three gram-keyed steps read the standing bucketed
    * [[gramStarts]] model — the doc-freq aggregation
    * (`min(doc)<>max(doc)` instead of count-distinct keeps the partial
    * aggregate O(1) per key) and the semi-join back are bucket-local
    * with no exchange; only the per-doc counts shuffle, keyed on
    * doc_id. The suffix-array original is the thing that does NOT
    * distribute, which is why production pipelines use this k-gram
    * reformulation.
    */
  def ddSubstring(spark: SparkSession, dir: String): DataFrame = {
    val docs = docsById(spark, dir)
    val grams = gramStarts(spark, dir)
    val shared = grams.groupBy("gh")
      .agg(min(col("doc_id")).as("d0"), max(col("doc_id")).as("d1"))
      .filter(col("d0") =!= col("d1"))
      .select("gh")
    val perDoc = grams.groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"))
    val dup = grams.join(shared, Seq("gh"), "left_semi")
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
    graft.functions.GraftFunctions.register(spark)
    val perDocB = TextAnalysis.docTerms(spark, dir)
      .select(col("doc_id"), col("lang"),
        // native codegen'd form of conv(substr(md5(term),1,4),16,10)
        // — identical values (VERDICT r11 item #8: idiom consistency
        // with the gram path)
        expr("graft_md5_prefix(term, 4) % 256").as("b"),
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
    // self-sufficient registration (the shard key is the native
    // md5-prefix expression): a filtered Verify run or a fresh session
    // must not depend on some OTHER query having registered first
    graft.functions.GraftFunctions.register(spark)
    val seqLen = 2048L
    val d = t(spark, dir, "documents")
      .select(col("doc_id"),
        size(graft.operators.TextAnalysis.tokens(col("text")))
          .cast("long").as("n_tok"),
        md5(col("doc_id").cast("string")).as("h"))
      // native md5-prefix (VERDICT r12 item #6 — the last composed
      // conv(substr(...)) retired); bit-identical to
      // CAST(conv(substr(h,1,4),16,10) AS BIGINT), and `h` itself
      // stays: it is the within-shard ORDER key below
      .withColumn("shard",
        expr("graft_md5_prefix(CAST(doc_id AS STRING), 4) % 8"))
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

  /** E5 (completion) — exact-substring SCRUB: the rewriting form of
    * [[ddSubstring]]'s profile (Lee et al.'s dedup pass actually CUTS
    * the duplicated spans; C4 likewise removes corpus-repeated lines).
    * A word position is covered when any of the ≤k 10-gram windows
    * containing it also occurs in another document; covered positions
    * are removed and the survivors re-joined in order. Emits per doc
    * the word/removal counts, the kept fraction, and the md5 of the
    * scrubbed text (the [[TextAnalysis.txScrub]] hash convention — the
    * rewritten corpus itself would be the model write).
    *
    * Scale (VERDICT r10 item #5, closed by the standing-model
    * promotion): both gram-keyed steps — the doc-freq aggregate (O(1)
    * `min<>max` partial, no count-distinct state) and the
    * duplicated-gram semi-join — read the standing bucketed
    * [[gramStarts]] model, so they are bucket-local on the 8-byte gram
    * hash: the corpus-sized explode shuffles ZERO times at query time,
    * and what r10 audited as the suite's heaviest exchange no longer
    * exists (r10's in-query form also recomputed the explode for each
    * of its two consumers; the standing model pays it once per corpus,
    * at ingest). What still moves: the duplicated STARTS shuffle to
    * the per-doc aggregation (state bounded by document length) — the
    * k× window expansion happens in-row AFTER that aggregate
    * (flatten∘transform over the collected starts), so no exchange
    * ever carries the position blowup — and the doc-keyed join back to
    * the text for reassembly, an in-row higher-order filter. No
    * window, no global sort, nothing driver-side.
    */
  /** The corpus-duplicated gram-hash set (doc freq ≥ 2), ITSELF a
    * standing model derived from [[gramStarts]] (one bucket-local
    * `min<>max` aggregate at build time): the probe target both the
    * batch scrub and the streaming twins cut against. Materializing it
    * matters most at ingest — [[graft.streaming.StreamScrub]] probes
    * every micro-batch against this set, so each batch scans the
    * (much smaller) duplicated-set parquet instead of re-aggregating
    * the corpus-sized gram relation, and the batch queries save one of
    * their two gram-model scans the same way. gh-bucketed, so the
    * semi-joins against [[gramStarts]] (same bucketing) stay
    * exchange-free on both sides.
    */
  private[graft] def sharedGrams(spark: SparkSession, dir: String)
      : DataFrame =
    Shared.model(spark, dir, "gram_shared_10", "gh", (s, d) =>
      gramStarts(s, d).groupBy("gh")
        .agg(min(col("doc_id")).as("d0"), max(col("doc_id")).as("d1"))
        .filter(col("d0") =!= col("d1"))
        .select("gh"))

  /** The covered-position sets of `grams`' documents vs `shared`, and
    * the surviving-words expression — the two shared pieces of the
    * profile form ([[scrubAgainst]]) and the rewrite form
    * ([[scrubbedCorpus]]).
    */
  private def coveredPositions(grams: DataFrame, shared: DataFrame,
      k: Int): DataFrame =
    grams.join(shared, Seq("gh"), "left_semi")
      .groupBy("doc_id")
      .agg(collect_set(col("s")).as("starts"))
      // expand starts → covered positions in-row, after the shuffle
      .select(col("doc_id"), array_distinct(flatten(
        transform(col("starts"),
          s => sequence(s, s + (k - 1))))).as("cov"))

  private def keptWords: org.apache.spark.sql.Column =
    filter(col("w"), (word, i) =>
      not(array_contains(
        coalesce(col("cov"), array().cast("array<int>")), i + 1)))

  /** Cut every position of `docs` (doc_id, w) covered by a gram whose
    * hash is in `shared`, and emit the scrub profile — the kernel
    * [[ddSubstringScrub]] and [[graft.streaming.StreamScrub]] share,
    * so batch and stream rewrite identically by construction. `grams`
    * must be the [[gramHashes]] explode of the same `docs`.
    */
  private[graft] def scrubAgainst(docs: DataFrame, grams: DataFrame,
      shared: DataFrame, k: Int = 10): DataFrame =
    docs.join(coveredPositions(grams, shared, k), Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_words"),
        coalesce(size(col("cov")), lit(0)).cast("long").as("n_removed"),
        // raw integer-operand quotient — no half-way rounding hazard
        ((size(col("w")) - coalesce(size(col("cov")), lit(0)))
          .cast("double") / size(col("w")).cast("double"))
          .as("kept_frac"),
        md5(concat_ws(" ", keptWords)).as("scrub_hash"))
      .orderBy("doc_id")

  def ddSubstringScrub(spark: SparkSession, dir: String): DataFrame = {
    // the doc_id-bucketed standing corpus: the reassembly join-back is
    // exchange-free on this side (see [[docsById]])
    val docs = docsById(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    scrubAgainst(docs, gramStarts(spark, dir), sharedGrams(spark, dir))
  }

  /** The REWRITTEN corpus itself — every corpus-duplicated span cut,
    * survivors re-joined, original metadata carried: the relation whose
    * md5 [[ddSubstringScrub]] reports as `scrub_hash`. Feed it to
    * [[scrubToModel]] to land the clean corpus in the catalog.
    */
  private[graft] def scrubbedCorpus(spark: SparkSession, dir: String)
      : DataFrame = {
    val docs = docsById(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        split(col("text"), " ").as("w"))
    docs
      .join(coveredPositions(gramStarts(spark, dir),
        sharedGrams(spark, dir), 10), Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("source"),
        concat_ws(" ", keptWords).as("text"),
        size(col("w")).cast("long").as("n_words_orig"),
        coalesce(size(col("cov")), lit(0)).cast("long").as("n_removed"))
  }

  /** Materialize the scrubbed corpus as a catalog model through the
    * A-layer (versioned overwrite, optional bucketing/tests riding the
    * registered ModelDef like any model write) — the production
    * consumption of the scrub: downstream curation/training reads
    * `ref(name)` instead of re-cutting per query. Returns the write's
    * row count, and the write is itself the scale path: one
    * corpus-linear pass, parquet out, nothing driver-side.
    */
  def scrubToModel(api: graft.api.FalApi, dir: String,
      name: String = "documents_scrubbed"): graft.api.WriteResult =
    api.writeToModel(scrubbedCorpus(api.spark, dir), name)

  /** E9 (completion) — corpus distribution drift: the admit/reject
    * readout a production ingest pipeline runs BEFORE merging a new
    * batch (does today's crawl look like the reference corpus, or did
    * the mix shift?). The corpus splits deterministically by doc_id
    * parity into a reference half and a candidate half; each side's
    * hashed-unigram distribution lands in 256 md5 buckets (the same
    * SQL-portable family tx_dsir uses), and the per-bucket add-one-
    * smoothed log probability ratio ln(p_ref/p_cand) is the drift
    * profile — the KL contribution per bucket, the thing a drift
    * monitor thresholds. Probabilities are emitted raw (single double
    * divisions, bitwise portable) and the log ratio through the
    * round(·,9) ulp-collapse idiom, so the analyst-side KL sum is one
    * multiply-accumulate away; the complement of [[graft.api.FalApi
    * .diffVersions]]' row-level diff (rows vs distributions).
    *
    * Scale: the only corpus-sized input is the standing doc_terms
    * model (tokenize-once); everything after is a 256-row aggregate —
    * one hash-agg shuffle on the bucket key with map-side partials,
    * then a 1-row totals broadcast. Corpus never moves.
    */
  /** The drift readout over a (b, ref_cnt, cand_cnt) bucket table —
    * add-one-smoothed probabilities + round(·,9) log-ratio per bucket,
    * 1-row totals broadcast. Shared by [[cuDrift]]'s in-corpus split
    * and [[graft.streaming.StreamDrift]]'s arriving-batch monitor, so
    * the two emit identical rows on identical counts.
    */
  private[graft] def driftReadout(byB: DataFrame): DataFrame = {
    val tot = byB.agg(sum(col("ref_cnt")).as("tot_r"),
      sum(col("cand_cnt")).as("tot_c"))
    byB.crossJoin(broadcast(tot))
      .select(col("b"), col("ref_cnt"), col("cand_cnt"),
        ((col("ref_cnt") + 1.0) / (col("tot_r") + 256.0)).as("p_ref"),
        ((col("cand_cnt") + 1.0) / (col("tot_c") + 256.0)).as("p_cand"),
        round(log((col("ref_cnt") + 1.0) / (col("tot_r") + 256.0)) -
          log((col("cand_cnt") + 1.0) / (col("tot_c") + 256.0)), 9)
          .as("log_ratio"))
      .orderBy("b")
  }

  /** The reference half's per-bucket unigram counts (even doc_ids) off
    * the standing doc_terms model — [[cuDrift]]'s baseline, and the
    * standing distribution the streaming monitor compares arrivals to.
    * Itself a STANDING model (≤256 rows): the ingest monitor probes it
    * every micro-batch, so the reference side must be a tiny parquet
    * read, never a per-batch re-aggregation of the corpus-sized
    * doc_terms relation.
    */
  private[graft] def driftRefCounts(spark: SparkSession, dir: String)
      : DataFrame =
    // aggregate-on-read (r12): reference counts are ADDITIVE across
    // ingest batches, so StandingIngest appends each arriving batch's
    // even-doc bucket counts and the read rolls the partials up —
    // bucket-local (b-bucketed), ≤256 groups, identity on a fresh
    // build
    Shared.model(spark, dir, "drift_ref_256", "b", (s, d) => {
      graft.functions.GraftFunctions.register(s)
      TextAnalysis.docTerms(s, d)
        .filter(col("doc_id") % 2 === 0)
        .select(expr("graft_md5_prefix(term, 4) % 256").as("b"),
          col("cnt"))
        .groupBy("b").agg(sum(col("cnt")).as("ref_cnt"))
    })
      .groupBy("b").agg(sum(col("ref_cnt")).as("ref_cnt"))
      // retraction appends NEGATIVE partials — a fully-retracted
      // bucket must read as absent, as a rebuild would have it
      // (identity outside retraction: append partials are positive)
      .filter(col("ref_cnt") =!= 0L)

  /** An arriving batch's even-doc bucket counts — [[driftRefCounts]]'
    * per-batch increment kernel. */
  private[graft] def driftRefCountsOf(batch: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(batch.sparkSession)
    batch.filter(col("doc_id") % 2 === 0)
      .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
      .select(expr("graft_md5_prefix(term, 4) % 256").as("b"))
      .groupBy("b").agg(count(lit(1)).as("ref_cnt"))
  }

  def cuDrift(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val byB = TextAnalysis.docTerms(spark, dir)
      .select((col("doc_id") % 2 === 0).as("is_ref"),
        expr("graft_md5_prefix(term, 4) % 256").as("b"),
        col("cnt"))
      .groupBy("b")
      .agg(sum(when(col("is_ref"), col("cnt")).otherwise(0L))
          .as("ref_cnt"),
        sum(when(!col("is_ref"), col("cnt")).otherwise(0L))
          .as("cand_cnt"))
    driftReadout(byB)
  }

  /** Tokenizer training — the first 3 BPE merges learned from the
    * corpus (Sennrich et al. 2016): repeatedly count adjacent symbol
    * pairs over the distinct-wordform table weighted by corpus
    * frequency, take the argmax (ties broken lexicographically for
    * determinism), and merge every non-overlapping occurrence
    * left-to-right. Emits one row per learned merge.
    *
    * Scale: the only corpus-sized pass is the standing `doc_terms`
    * aggregation — BPE training state is the (wordform, count) table
    * (vocabulary-sized, millions of rows at 100 TB, never the corpus),
    * so each iteration is per-term window work that shards on the term
    * key plus one pair aggregation and a top-1 TakeOrdered. The argmax
    * joins back as a 1-row broadcast — the merge table never routes
    * through the driver.
    *
    * Left-to-right non-overlap is made window-expressible (identically
    * in both engines) instead of a sequential fold: occurrences of the
    * best pair at consecutive positions form a chain (possible when
    * l = r, e.g. `aaaa`, or l/r alternate, e.g. `abab`); within each
    * chain exactly the odd-ranked occurrences merge, and a position is
    * dropped when its predecessor merged.
    */
  /** Apply ONE merge (a 1-row `(bl, br, bm)` frame, broadcast) to a
    * symbol table (term, tcnt, pos, sym) under the chain-parity
    * left-to-right non-overlap rule — the APPLICATION half of
    * [[txBpeMerges]]' iteration, factored out so the streaming
    * tokenizer ([[graft.streaming.StreamBpe]]) segments arriving words
    * with the exact kernel training used (batch ≡ stream by
    * construction). Window work shards on the term key; the merge row
    * broadcasts.
    */
  private[graft] def bpeApplyMerge(seq: DataFrame, merge: DataFrame)
      : DataFrame = {
    val byPos = Window.partitionBy("term").orderBy("pos")
    val s1 = seq.withColumn("nxt", lead(col("sym"), 1).over(byPos))
    val occ = s1.crossJoin(broadcast(merge))
      .filter(col("sym") === col("bl") && col("nxt") === col("br"))
      .select(col("term"), col("pos"), col("bm"))
    val merges = occ
      .withColumn("grp", col("pos") - row_number().over(byPos))
      .withColumn("rn", row_number().over(
        Window.partitionBy("term", "grp").orderBy("pos")))
      .filter(col("rn") % 2 === 1)
      .select("term", "pos", "bm")
    s1.join(merges, Seq("term", "pos"), "left")
      .withColumn("prevm", lag(col("bm"), 1).over(byPos))
      .filter(col("prevm").isNull)
      .select(col("term"), col("tcnt"), col("pos").as("opos"),
        coalesce(col("bm"), col("sym")).as("sym"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("term").orderBy("opos")))
      .select("term", "tcnt", "pos", "sym")
  }

  /** The 3 training iterations: returns the per-iteration best-pair
    * frames and the FINAL symbol table (the trained segmentation of
    * every vocab term). Memoized per corpus dir: the two standing
    * models ([[bpeSegmentation]], [[bpeLearnedMerges]]) are byproducts
    * of ONE pass — sharing the per-iteration cached frames means a
    * process touching both trains once, not twice. The memo is skipped
    * under `graft.schemaOnly` so a schema-only walk can't seed real
    * consumers with unmaterialized-lineage frames, and is keyed on the
    * SESSION as well as the dir: the frames (and their cached
    * intermediates) are session-bound, so a restarted session must
    * re-derive rather than receive plans pinned to a stopped session.
    */
  private val bpeTrained = scala.collection.concurrent.TrieMap
    .empty[String, (SparkSession, Seq[DataFrame], DataFrame)]

  // a fixture rewrite of `dir` must drop the memo trained on the
  // pre-rewrite corpus (ADVICE r11), alongside Shared's own memos
  Shared.onInvalidate(dir => { bpeTrained.remove(dir); () })

  private def bpeTrain(spark: SparkSession, dir: String)
      : (Seq[DataFrame], DataFrame) =
    if (Shared.schemaOnly(spark)) bpeTrainOnce(spark, dir)
    else bpeTrained.get(dir) match {
      // the memo'd frames (and their .cache()'d intermediates) are
      // session-bound: reuse only for the SAME live session object
      // (`eq`, not an identity hash — hashes can be reused after a
      // stopped session is GC'd; ADVICE r11), recompute-and-replace
      // otherwise (which also evicts entries pinned to dead sessions)
      case Some((owner, bests, seq))
          if (owner eq spark) && !owner.sparkContext.isStopped =>
        (bests, seq)
      case _ =>
        val trained = bpeTrainOnce(spark, dir)
        bpeTrained.put(dir, (spark, trained._1, trained._2))
        trained
    }

  private def bpeTrainOnce(spark: SparkSession, dir: String)
      : (Seq[DataFrame], DataFrame) = {
    val byPos = Window.partitionBy("term").orderBy("pos")
    def iter(seq: DataFrame): (DataFrame, DataFrame) = {
      val s1 = seq.withColumn("nxt", lead(col("sym"), 1).over(byPos))
      val best = s1.filter(col("nxt").isNotNull)
        .select(col("sym").as("l"), col("nxt").as("r"), col("tcnt"))
        .groupBy("l", "r").agg(sum(col("tcnt")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("l"), col("r")).limit(1)
        .withColumn("merged", concat(col("l"), col("r")))
      val next = bpeApplyMerge(seq, best.select(col("l").as("bl"),
        col("r").as("br"), col("merged").as("bm")))
      (next.cache(), best)
    }
    val tc = TextAnalysis.docTerms(spark, dir)
      .groupBy("term").agg(sum(col("cnt")).as("tcnt"))
    var seq = tc
      .select(col("term"), col("tcnt"),
        explode(sequence(lit(1), length(col("term")))).as("pos"))
      .select(col("term"), col("tcnt"), col("pos"),
        col("term").substr(col("pos"), lit(1)).as("sym"))
    val bests = (1 to 3).map { it =>
      val (next, best) = iter(seq)
      seq = next
      best.select(lit(it.toLong).as("it"), col("l").as("left_sym"),
        col("r").as("right_sym"), col("merged"), col("pair_count"))
    }
    (bests, seq)
  }

  def txBpeMerges(spark: SparkSession, dir: String): DataFrame =
    bpeTrain(spark, dir)._1.reduce(_.union(_)).orderBy("it")

  /** BATCHED BPE training geometry (VERDICT r11 item #2): per
    * iteration, up to [[BpeBatchM]] mutually non-interacting pairs are
    * learned from the iteration-start counts and applied in ONE
    * chain-parity pass — the standard parallel-BPE move that replaces
    * per-merge job latency (the 3-merge trainer's loop shape, unusable
    * beyond O(10) merges) with per-BATCH latency. 12×16 trains 69
    * merges on this corpus (≥ 64, the round target) in 12 Spark
    * iterations instead of 69.
    */
  private[graft] val BpeBatchIters = 12
  private[graft] val BpeBatchM = 16
  private[graft] val BpeBatchK = 48

  /** One batched iteration over a (term, tcnt, pos, sym) symbol table:
    * (kept merge table with ranks, next symbol table).
    *
    * Selection is the CONSERVATIVE non-interaction rule — a top-K
    * candidate is kept iff NO higher-ranked candidate (kept OR
    * dropped) shares a symbol with it or collides on the merged
    * string; take the first M keepers. Pairwise symbol-disjointness
    * follows (kept pairs are mutually higher/lower ranked), which is
    * what makes the batch ≡ the sequential fold of the same pairs:
    * disjoint pairs' occurrences cannot overlap (adjacent occurrences
    * share their middle symbol, so they would share a symbol), so
    * [[bpeApplyMerge]]'s chain-parity window applies them all in one
    * pass unchanged, and no pair's count is disturbed by another's
    * application before the next iteration re-counts. The rule is
    * deliberately join-expressible (one NOT-EXISTS against
    * higher-ranked candidates) rather than the sequential greedy scan,
    * so the DuckDB oracle replays it exactly; the price is keeping
    * fewer pairs per round when candidates chain-interact (rank 3
    * dropped because it touches dropped rank 2) — more iterations,
    * same learned quality class.
    *
    * Scale: the symbol table is VOCABULARY-sized (millions of rows at
    * 100 TB, never the corpus); per iteration the window work shards
    * on the term key, the pair aggregation is one map-side-combined
    * shuffle, and the candidate/keeper tables are ≤ K rows (broadcast
    * self-join + a K-row global window — bounded, audited).
    */
  private def bpeBatchKept(seq: DataFrame, k: Int = BpeBatchK,
      m: Int = BpeBatchM, thin: Boolean = false,
      sep: String = "", chainOnly: Boolean = false): DataFrame = {
    val byPos = Window.partitionBy("term").orderBy("pos")
    val s1 = seq.withColumn("nxt", lead(col("sym"), 1).over(byPos))
    val topK = s1.filter(col("nxt").isNotNull)
      .select(col("sym").as("l"), col("nxt").as("r"), col("tcnt"))
      .groupBy("l", "r").agg(sum(col("tcnt")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("l"), col("r"))
      .limit(k)
    // the DEEP schedule thins candidates to the best pair PER LEFT
    // SYMBOL before the keeper rule (VERDICT r12 item #1): the top-K
    // pairs concentrate on a few dominant symbols, so the conservative
    // NOT-EXISTS rule over the raw top-K drops almost everything
    // (every candidate shares a symbol with some higher-ranked one) —
    // measured ~3 merges/iteration however large K grows. One
    // deterministic argmax per left symbol (count desc, r asc)
    // sparsifies the interaction graph — candidates then share symbols
    // only through r-collisions — and the SAME rule keeps most of the
    // batch. Deferred second-best pairs for a popular left symbol
    // simply surface in a later iteration's recount, exactly like
    // pairs outside the window.
    val cand = (if (!thin) topK
      else {
        val byL = Window.partitionBy("l")
          .orderBy(col("pair_count").desc, col("r"))
        topK.withColumn("lrn", row_number().over(byL))
          .filter(col("lrn") === 1).drop("lrn")
      }).cache()
    val q = cand.toDF("ql", "qr", "qc")
    val higherRanked = col("qc") > col("pair_count") ||
      (col("qc") === col("pair_count") &&
        (col("ql") < col("l") ||
          (col("ql") === col("l") && col("qr") < col("r"))))
    // `sep` is the merged-symbol joiner ("" for character merges, " "
    // for the phrase trainer) — the collision arm must use it too, or
    // two phrase pairs like ("a b","c") / ("a","b c") would not be
    // seen as producing the same merged symbol
    val collides = concat(col("ql"), lit(sep), col("qr")) ===
      concat(col("l"), lit(sep), col("r"))
    // chainOnly (the deep trainer, VERDICT r12 item #1) relaxes the
    // interaction predicate from ANY shared symbol to CROSS-CHAINING
    // only: two occurrences of distinct pairs p, q can share a symbol
    // INSTANCE only when that instance is p's right and q's left (or
    // vice versa), i.e. p.r = q.l — a position cannot start two
    // different pairs (same-left is safe) nor end two (same-right is
    // safe), and same-pair runs are what the parity window already
    // resolves. On a small closed alphabet this is the difference
    // between ~8 keepers per round (every top pair shares a word with
    // a higher-ranked one) and alphabet-bound batches; batch ≡
    // sequential-fold still holds (BpeScrubSpec pins the same-left /
    // same-right / chain cases).
    val interacts =
      if (chainOnly)
        col("ql") === col("r") || col("qr") === col("l") || collides
      else col("ql") === col("l") || col("ql") === col("r") ||
        col("qr") === col("l") || col("qr") === col("r") || collides
    cand
      .join(broadcast(q), higherRanked && interacts, "left_anti")
      .orderBy(col("pair_count").desc, col("l"), col("r"))
      .limit(m)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("pair_count").desc, col("l"), col("r"))))
      .withColumn("merged", concat(col("l"), lit(sep), col("r")))
  }

  /** localCheckpoint + SEVER the statistics lineage. Checkpointing
    * truncates the LOGICAL lineage (LogicalRDD), but
    * `LogicalRDD.fromDataset` copies the origin plan's STATISTICS
    * forward — and the trainer's per-iteration join products compound
    * those BigInt `sizeInBytes` estimates exponentially (each round's
    * plan multiplies the previous round's estimate several times, so
    * the integer's BIT LENGTH roughly triples per iteration; by
    * iteration ~20 the driver spends minutes inside Karatsuba/ToomCook
    * multiplication in `SizeInBytesOnlyStatsPlanVisitor`, one core
    * pinned, executors idle — observed live via jstack at
    * [[BpeDeepIters]] depth). Rebuilding the DataFrame from the
    * checkpointed RDD + schema drops the carried stats to the default
    * estimate, which is harmless here: every size-sensitive join in
    * the trainer is an explicit `broadcast()`. The Row round-trip
    * costs one extra deserialization over a vocabulary-sized frame —
    * nothing next to the minutes of BigInteger math it removes.
    */
  private[graft] def checkpointSevered(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }

  private def bpeBatchIter(seq: DataFrame, k: Int = BpeBatchK,
      m: Int = BpeBatchM, thin: Boolean = false, sep: String = "",
      chainOnly: Boolean = false): (DataFrame, DataFrame) = {
    val kept = bpeBatchKept(seq, k, m, thin, sep, chainOnly).cache()
    val next = bpeApplyMerge(seq, kept.select(col("l").as("bl"),
      col("r").as("br"), col("merged").as("bm")))
    // checkpoint, not cache: each iteration's plan embeds the
    // previous seq ~3× (the apply kernel reads it for the lead frame,
    // the occurrence join, and the reassembly), so lazily-chained
    // iterations build an exponentially-sized logical tree that the
    // analyzer walks on every further op — measured as minutes of
    // plan-time at iteration depth 12 vs milliseconds of data-time on
    // the vocab-sized table. Checkpointing truncates the lineage to a
    // constant-size LogicalRDD per iteration (local is fine: the
    // frame is vocabulary-sized and the trainer is one job; a cluster
    // run with executor churn would use reliable checkpointing), and
    // [[checkpointSevered]] additionally drops the carried statistics
    // (see its scaladoc — the stats compound exponentially too).
    // (Measured and rejected: checkpointing every 2nd iteration with
    // lazy or cached odd iterations — both ~7-15% SLOWER; the eager
    // truncation each round is the cheapest shape.)
    (kept, checkpointSevered(next))
  }

  /** E9/E7 — batched tokenizer training at depth: [[BpeBatchIters]]
    * batched iterations over the corpus vocabulary, one row per
    * learned merge `(it, rank, left_sym, right_sym, merged,
    * pair_count)`. The 3-merge [[txBpeMerges]] stays as the
    * fine-grained oracle twin and the standing streaming model; this
    * is the production depth path (batched ≡ per-merge sequential fold
    * pinned by BpeScrubSpec on the pathological `aaaa`/`abab` runs and
    * against a reference batched trainer on the corpus).
    */
  /** The full batched training pass: (per-iteration kept-merge frames
    * with it/mrank columns, FINAL symbol table). Memoized per
    * (session, dir) with the same liveness-validated keying as
    * [[bpeTrain]], so the gated merge listing and the standing deep
    * segmentation share ONE training run. */
  private val bpeBatchTrained = scala.collection.concurrent.TrieMap
    .empty[String, (SparkSession, Seq[DataFrame], DataFrame)]

  Shared.onInvalidate(dir => { bpeBatchTrained.remove(dir); () })

  private def bpeBatchTrain(spark: SparkSession, dir: String)
      : (Seq[DataFrame], DataFrame) =
    if (Shared.schemaOnly(spark)) bpeBatchTrainOnce(spark, dir)
    else bpeBatchTrained.get(dir) match {
      case Some((owner, merges, seq))
          if (owner eq spark) && !owner.sparkContext.isStopped =>
        (merges, seq)
      case _ =>
        val trained = bpeBatchTrainOnce(spark, dir)
        bpeBatchTrained.put(dir, (spark, trained._1, trained._2))
        trained
    }

  private def bpeBatchTrainOnce(spark: SparkSession, dir: String)
      : (Seq[DataFrame], DataFrame) = {
    var seq = TextAnalysis.docTerms(spark, dir)
      .groupBy("term").agg(sum(col("cnt")).as("tcnt"))
      .select(col("term"), col("tcnt"),
        explode(sequence(lit(1), length(col("term")))).as("pos"))
      .select(col("term"), col("tcnt"), col("pos"),
        col("term").substr(col("pos"), lit(1)).as("sym"))
    // schema-only walks must not run the eager per-iteration
    // checkpoints (and don't need depth — the merge-row schema is
    // fixed from iteration 1)
    val iters = if (Shared.schemaOnly(spark)) 1 else BpeBatchIters
    val merges = (1 to iters).map { it =>
      val (kept, next) =
        if (Shared.schemaOnly(spark)) {
          val k = bpeBatchKept(seq); (k, seq)
        } else bpeBatchIter(seq)
      seq = next
      kept.select(lit(it.toLong).as("it"),
        col("rank").cast("long").as("mrank"), col("l").as("left_sym"),
        col("r").as("right_sym"), col("merged"), col("pair_count"))
    }
    (merges, seq)
  }

  def txBpeBatch(spark: SparkSession, dir: String): DataFrame =
    bpeBatchTrain(spark, dir)._1.reduce(_.union(_)).orderBy("it", "mrank")

  /** PRODUCTION-DEPTH BPE training (VERDICT r12 item #1, ≥1,000
    * merges). Two data facts shape the design:
    *
    *   1. This corpus's WORD vocabulary is CLOSED — 31 distinct words
    *      at every scale factor — so word-internal BPE saturates at 89
    *      merges with every vocab word a single symbol (pinned by
    *      BpeScrubSpec); no schedule can train deeper within words.
    *      The depth that exists in the corpus is its PHRASE structure,
    *      so the deep trainer follows the sentencepiece convention
    *      (no whitespace pre-split: merges may cross word boundaries),
    *      initialized at word granularity — each document's word
    *      stream is one training sequence, merged symbols are
    *      space-joined phrases. Word-boundary initialization keeps the
    *      symbol table at O(corpus word positions), not characters,
    *      and the first-89-merge word-collapse phase (already covered
    *      by the word-level twins) is skipped rather than re-learned.
    *   2. The fixed 16-of-48 batch left merge throughput flat, so the
    *      candidate window and batch cap SCALE WITH THE ITERATION
    *      ([[bpeDeepM]] = min(4·m, cap), K = 3·M) and candidates are
    *      thinned to the best pair per left symbol before the
    *      unchanged symbol-disjoint keeper rule (see [[bpeBatchKept]]
    *      — the raw top-K concentrates on dominant symbols and the
    *      conservative rule over it keeps ~3/iteration no matter how
    *      large K grows).
    *
    * The schedule is a pure function of the iteration index, so the
    * DuckDB oracle replays it exactly (per-iteration LIMITs in the
    * unrolled CTEs), and batched ≡ sequential-fold holds per batch
    * (kept pairs stay pairwise symbol-disjoint — the same argument,
    * now over phrase symbols).
    *
    * Scale: the symbol table is one row per corpus word POSITION
    * (sequences shard by doc_id), shrinking as merges apply; each
    * iteration is the same map-side-combined pair count + bounded
    * candidate selection + one chain-parity pass the 12×16 trainer
    * runs. Real tokenizer training samples a bounded corpus subset —
    * at 100 TB this trainer would read a sampled standing corpus
    * slice, same plan.
    */
  private[graft] val BpeDeepIters = 84
  private[graft] val BpeDeepCapM = 128
  private[graft] def bpeDeepM(it: Int): Int = math.min(4 * it, BpeDeepCapM)
  private[graft] def bpeDeepK(it: Int): Int = math.min(16 * it, 1024)
  /** Deterministic training sample: every 10th document — production
    * tokenizer training reads a bounded corpus sample, never the full
    * corpus, and the sample keeps ~120 vocabulary-sized iterations in
    * the tens-of-seconds build class. The modulus is part of the
    * trained artifact's definition (the oracle applies the same
    * filter). */
  private[graft] val BpeDeepSampleMod = 10L

  /** The deep training pass: (per-iteration kept-merge frames, FINAL
    * symbol table — `term` is the doc_id, `sym` a space-joined
    * phrase). Memoized per (session, dir) like the fixed-batch
    * trainer; the standing models below make the memo a same-process
    * convenience only (the catalog pays training once per corpus
    * EVER). */
  private val bpeDeepTrained = scala.collection.concurrent.TrieMap
    .empty[String, (SparkSession, Seq[DataFrame], DataFrame)]

  Shared.onInvalidate(dir => { bpeDeepTrained.remove(dir); () })

  private def bpeDeepTrain(spark: SparkSession, dir: String)
      : (Seq[DataFrame], DataFrame) =
    if (Shared.schemaOnly(spark)) bpeDeepTrainOnce(spark, dir)
    else bpeDeepTrained.get(dir) match {
      case Some((owner, merges, seq))
          if (owner eq spark) && !owner.sparkContext.isStopped =>
        (merges, seq)
      case _ =>
        val trained = bpeDeepTrainOnce(spark, dir)
        bpeDeepTrained.put(dir, (spark, trained._1, trained._2))
        trained
    }

  private def bpeDeepTrainOnce(spark: SparkSession, dir: String)
      : (Seq[DataFrame], DataFrame) = {
    // one training sequence per document: term = doc_id, symbols = the
    // doc's words in order (the sentencepiece no-presplit convention
    // at word granularity; doc_id is unique, so tcnt = 1)
    // the sampled symbol table is tiny (one row per sampled word
    // position); pre-shard it on the sequence key at low parallelism
    // so the ~[[BpeDeepIters]] per-iteration window/agg stages run a
    // handful of tasks instead of 32 near-empty ones
    var seq = t(spark, dir, "documents")
      .filter(col("doc_id") % BpeDeepSampleMod === 0)
      .select(col("doc_id").as("term"), lit(1L).as("tcnt"),
        posexplode(split(col("text"), " ")).as(Seq("p0", "sym")))
      .select(col("term"), col("tcnt"),
        (col("p0") + 1).cast("int").as("pos"), col("sym"))
      .repartition(8, col("term"))
    val iters = if (Shared.schemaOnly(spark)) 1 else BpeDeepIters
    val merges = (1 to iters).map { it =>
      val (kept, next) =
        if (Shared.schemaOnly(spark)) {
          val k = bpeBatchKept(seq, bpeDeepK(it), bpeDeepM(it),
            thin = true, sep = " ", chainOnly = true)
          (k, seq)
        } else bpeBatchIter(seq, bpeDeepK(it), bpeDeepM(it),
          thin = true, sep = " ", chainOnly = true)
      seq = next
      kept.select(lit(it.toLong).as("it"),
        col("rank").cast("long").as("mrank"), col("l").as("left_sym"),
        col("r").as("right_sym"), col("merged"), col("pair_count"))
    }
    (merges, seq)
  }

  /** The deep trainer's raw merge table (training runs here). The
    * GATED [[txBpeDeep]] reads the standing model instead, so queries
    * pay catalog-resolve cost, not training. */
  private def txBpeDeepTrain(spark: SparkSession, dir: String): DataFrame =
    bpeDeepTrain(spark, dir)._1.reduce(_.union(_)).orderBy("it", "mrank")

  /** Training-throughput probe (graft.ScalingProbe's deep-BPE block):
    * run the trainer end-to-end BYPASSING the memo and the catalog,
    * returning (total merges, wall seconds, per-iteration yields) —
    * the merges/second evidence VERDICT r12 item #1 asks for. */
  private[graft] def bpeDeepProbe(spark: SparkSession, dir: String)
      : (Long, Double, Seq[Long]) = {
    val t0 = System.nanoTime()
    val (merges, _) = bpeDeepTrainOnce(spark, dir)
    val secs = (System.nanoTime() - t0) / 1e9
    val perIter = merges.map(_.count())
    (perIter.sum, secs, perIter)
  }

  /** The deep trained segmentation as a standing doc-bucketed model —
    * the phrase trainer's final symbol table (≥1,000 merges at sf0.1),
    * the state a production tokenizer serves. Trained once per corpus
    * as a catalog-resident build. */
  private[graft] def bpePhraseSeg(spark: SparkSession,
      dir: String): DataFrame =
    Shared.model(spark, dir, s"bpe_phrase_seg_$BpeDeepIters",
      "term", (s, d) => bpeDeepTrain(s, d)._2)

  /** The deep trainer's full merge table as a standing model — the
    * replay target for tokenizing documents the trainer never saw. */
  private[graft] def bpePhraseMerges(spark: SparkSession,
      dir: String): DataFrame =
    Shared.model(spark, dir, s"bpe_phrase_merges_$BpeDeepIters", "it",
      (s, d) => txBpeDeepTrain(s, d))

  /** E9 — tokenizer training AT PRODUCTION DEPTH (VERDICT r12 item
    * #1): the adaptive-schedule phrase trainer's learned merge table,
    * one row per merge `(it, mrank, left_sym, right_sym, merged,
    * pair_count)` — ≥1,000 rows at sf0.1 — read off the standing
    * catalog model (training is an ingest-time build, not a query
    * cost). The oracle replays all [[BpeDeepIters]] adaptive
    * iterations in unrolled materialized CTEs.
    */
  def txBpeDeep(spark: SparkSession, dir: String): DataFrame =
    bpePhraseMerges(spark, dir).orderBy("it", "mrank")

  /** E9 — deep-tokenizer APPLICATION over the corpus: every document's
    * segmentation under the full learned phrase-merge sequence, off
    * the standing doc-bucketed segmentation model — one row per doc
    * with its symbol count and '|'-joined segmentation. The rollup is
    * bucket-local on the doc key; the oracle replays the schedule and
    * aggregates the final table.
    */
  def txBpeDeepApply(spark: SparkSession, dir: String): DataFrame =
    bpePhraseSeg(spark, dir)
      .groupBy("term")
      .agg(count(lit(1)).cast("long").as("n_syms"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("sym")))),
          p => p.getField("sym")), "|").as("segmentation"))
      .select(col("term").as("doc_id"), col("n_syms"),
        col("segmentation"))
      .orderBy("doc_id")

  /** The deep trained segmentation of the WORD vocabulary as a
    * standing term-bucketed model — the 12×16 batched trainer's final
    * symbol table. On this corpus's CLOSED 31-word vocabulary that is
    * 69 merges from full depth (word-internal BPE saturates at 89
    * merges with every vocab word a single symbol — pinned by
    * BpeScrubSpec; the production-depth trainer continues PAST the
    * word boundary, see [[bpePhraseMerges]]). */
  private[graft] def bpeBatchSegmentation(spark: SparkSession,
      dir: String): DataFrame =
    Shared.model(spark, dir, s"bpe_seg_b${BpeBatchIters}x$BpeBatchM",
      "term", (s, d) => bpeBatchTrain(s, d)._2)

  /** The batched trainer's full merge table as a standing model —
    * the replay target [[graft.streaming.StreamBpeDeep]] applies to
    * NOVEL words (words outside the trained vocabulary segment by
    * replaying the learned merges, exactly as the trained tokenizer
    * would; a dictionary lookup alone would get them wrong). */
  private[graft] def bpeBatchMerges(spark: SparkSession,
      dir: String): DataFrame =
    Shared.model(spark, dir,
      s"bpe_merges_b${BpeBatchIters}x$BpeBatchM", "it",
      (s, d) => txBpeBatch(s, d))

  /** E9 — tokenizer application AT DEPTH: every vocab term's
    * segmentation under the BATCHED trainer's full merge sequence (69
    * merges vs the 3-merge [[txBpeApply]] twin), off the standing
    * term-bucketed deep-segmentation model. Same rollup kernel and the
    * same bucket-local plan as the 3-merge apply; the oracle replays
    * the 12 batched iterations and aggregates the final table — the
    * deep-training → deep-application loop closed end to end.
    */
  def txBpeApplyDeep(spark: SparkSession, dir: String): DataFrame =
    bpeBatchSegmentation(spark, dir)
      .groupBy("term", "tcnt")
      .agg(count(lit(1)).cast("long").as("n_syms"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("sym")))),
          p => p.getField("sym")), "|").as("segmentation"))
      .select(col("term"), col("tcnt"), col("n_syms"),
        col("segmentation"))
      .orderBy("term")

  /** The trained segmentation as STANDING models (compute-at-ingest:
    * train once per corpus, tokenize many) — `bpe_seg_3` is the final
    * (term, tcnt, pos, sym) table bucketed on the term key,
    * `bpe_merges_3` the 3-row learned-merge table the streaming
    * tokenizer replays on unseen words.
    */
  private[graft] def bpeSegmentation(spark: SparkSession, dir: String)
      : DataFrame =
    Shared.model(spark, dir, "bpe_seg_3", "term",
      (s, d) => bpeTrain(s, d)._2)

  private[graft] def bpeLearnedMerges(spark: SparkSession, dir: String)
      : DataFrame =
    Shared.model(spark, dir, "bpe_merges_3", "it",
      (s, d) => txBpeMerges(s, d))

  /** Tokenizer APPLICATION — the consumption half of [[txBpeMerges]]
    * (train once, tokenize everything): every vocab term's trained
    * segmentation after the 3 learned merges, with its corpus
    * frequency and BPE token count. The per-corpus readout a pipeline
    * uses to budget sequence packing under a trained tokenizer
    * (fertility = n_syms weighted by tcnt), and the batch twin the
    * streaming tokenizer is pinned against.
    *
    * Scale: reads the standing term-bucketed segmentation model — the
    * per-term rollup is bucket-local, output is vocabulary-sized, the
    * corpus is never touched at query time (training itself only ever
    * aggregates the corpus once into the vocab-sized term table).
    */
  def txBpeApply(spark: SparkSession, dir: String): DataFrame =
    bpeSegmentation(spark, dir)
      .groupBy("term", "tcnt")
      .agg(count(lit(1)).cast("long").as("n_syms"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("sym")))),
          p => p.getField("sym")), "|").as("segmentation"))
      .select(col("term"), col("tcnt"), col("n_syms"),
        col("segmentation"))
      .orderBy("term")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_substring" -> ddSubstring _,
    "dd_substring_scrub" -> ddSubstringScrub _,
    "tx_bpe_merges" -> txBpeMerges _,
    "tx_bpe_batch" -> txBpeBatch _,
    "tx_bpe_deep" -> txBpeDeep _,
    "tx_bpe_deep_apply" -> txBpeDeepApply _,
    "tx_bpe_apply" -> txBpeApply _,
    "tx_bpe_apply_deep" -> txBpeApplyDeep _,
    "tx_pack" -> txPack _,
    "tx_dsir" -> txDsir _,
    "cu_drift" -> cuDrift _)

  /** One BPE iteration as DuckDB CTEs: input seq CTE `in` (term, tcnt,
    * pos, sym) → best-pair CTE `b$n` and merged seq CTE `q$n` — the
    * textual twin of [[txBpeMerges]]' iter (same chain-parity merge
    * rule).
    */
  private def sqlBpeIter(n: Int, in: String): String = s"""
      s$n AS (
        SELECT term, tcnt, pos, sym,
               lead(sym) OVER (PARTITION BY term ORDER BY pos) AS nxt
        FROM $in),
      b$n AS (
        SELECT sym AS l, nxt AS r, sym || nxt AS merged,
               CAST(sum(tcnt) AS BIGINT) AS pair_count
        FROM s$n WHERE nxt IS NOT NULL GROUP BY sym, nxt
        ORDER BY pair_count DESC, l, r LIMIT 1),
      o$n AS (
        SELECT s.term, s.pos FROM s$n s, b$n b
        WHERE s.sym = b.l AND s.nxt = b.r),
      g$n AS (
        SELECT term, pos,
               pos - row_number() OVER (PARTITION BY term ORDER BY pos)
                 AS grp
        FROM o$n),
      m$n AS (
        SELECT term, pos FROM (
          SELECT term, pos, row_number() OVER
                   (PARTITION BY term, grp ORDER BY pos) AS rn
          FROM g$n)
        WHERE rn % 2 = 1),
      q$n AS (
        SELECT term, tcnt,
               row_number() OVER (PARTITION BY term ORDER BY opos)
                 AS pos,
               sym
        FROM (
          SELECT s.term, s.tcnt, s.pos AS opos,
                 CASE WHEN m.pos IS NOT NULL THEN b.merged
                      ELSE s.sym END AS sym,
                 lag(CASE WHEN m.pos IS NOT NULL THEN 1 END) OVER
                   (PARTITION BY s.term ORDER BY s.pos) AS prevm
          FROM s$n s
          LEFT JOIN m$n m ON m.term = s.term AND m.pos = s.pos
          CROSS JOIN b$n b)
        WHERE prevm IS NULL)"""

  /** One BATCHED iteration as DuckDB CTEs — the textual twin of
    * [[bpeBatchIter]]: top-K candidates, the join-expressible
    * conservative keeper rule (NOT EXISTS against higher-ranked
    * interacting candidates), and the multi-pair chain-parity apply
    * (each occurrence carries its own merged symbol through the
    * parity window).
    */
  private def sqlBpeBatchIter(n: Int, in: String,
      k: Int = BpeBatchK, m: Int = BpeBatchM,
      thin: Boolean = false, sep: String = "",
      chainOnly: Boolean = false): String = s"""
      s$n AS MATERIALIZED (
        SELECT term, tcnt, pos, sym,
               lead(sym) OVER (PARTITION BY term ORDER BY pos) AS nxt
        FROM $in),
      c$n AS MATERIALIZED (${if (!thin) s"""
        SELECT sym AS l, nxt AS r, CAST(sum(tcnt) AS BIGINT)
                 AS pair_count
        FROM s$n WHERE nxt IS NOT NULL GROUP BY sym, nxt
        ORDER BY pair_count DESC, l, r LIMIT $k""" else s"""
        SELECT l, r, pair_count FROM (
          SELECT l, r, pair_count, row_number() OVER
                   (PARTITION BY l ORDER BY pair_count DESC, r) AS lrn
          FROM (
            SELECT sym AS l, nxt AS r, CAST(sum(tcnt) AS BIGINT)
                     AS pair_count
            FROM s$n WHERE nxt IS NOT NULL GROUP BY sym, nxt
            ORDER BY pair_count DESC, l, r LIMIT $k))
        WHERE lrn = 1"""}),
      k$n AS MATERIALIZED (
        SELECT l, r, pair_count,
               CAST(row_number() OVER
                 (ORDER BY pair_count DESC, l, r) AS BIGINT) AS mrank,
               l || '$sep' || r AS merged
        FROM c$n c
        WHERE NOT EXISTS (
          SELECT 1 FROM c$n q
          WHERE (q.pair_count > c.pair_count OR
                 (q.pair_count = c.pair_count AND
                  (q.l < c.l OR (q.l = c.l AND q.r < c.r))))
            AND (${if (chainOnly) "q.l = c.r OR q.r = c.l"
      else "q.l IN (c.l, c.r) OR q.r IN (c.l, c.r)"}
                 OR q.l || '$sep' || q.r = c.l || '$sep' || c.r))
        ORDER BY pair_count DESC, l, r LIMIT $m),
      o$n AS (
        SELECT s.term, s.pos, k.merged FROM s$n s
        JOIN k$n k ON s.sym = k.l AND s.nxt = k.r),
      g$n AS (
        SELECT term, pos, merged,
               pos - row_number() OVER (PARTITION BY term ORDER BY pos)
                 AS grp
        FROM o$n),
      m$n AS (
        SELECT term, pos, merged FROM (
          SELECT term, pos, merged, row_number() OVER
                   (PARTITION BY term, grp ORDER BY pos) AS rn
          FROM g$n)
        WHERE rn % 2 = 1),
      q$n AS MATERIALIZED (
        SELECT term, tcnt,
               row_number() OVER (PARTITION BY term ORDER BY opos)
                 AS pos,
               sym
        FROM (
          SELECT s.term, s.tcnt, s.pos AS opos,
                 CASE WHEN m.pos IS NOT NULL THEN m.merged
                      ELSE s.sym END AS sym,
                 lag(CASE WHEN m.pos IS NOT NULL THEN 1 END) OVER
                   (PARTITION BY s.term ORDER BY s.pos) AS prevm
          FROM s$n s
          LEFT JOIN m$n m ON m.term = s.term AND m.pos = s.pos)
        WHERE prevm IS NULL)"""

  private def sqlBpeBatch: String = {
    val iters = (1 to BpeBatchIters)
      .map(n => sqlBpeBatchIter(n, if (n == 1) "s0" else s"q${n - 1}"))
      .mkString(",")
    val selects = (1 to BpeBatchIters)
      .map(n => s"SELECT CAST($n AS BIGINT) AS it, mrank, " +
        s"l AS left_sym, r AS right_sym, merged, pair_count FROM k$n")
      .mkString("\n      UNION ALL\n      ")
    s"""
      WITH tc AS (
        SELECT term, CAST(count(*) AS BIGINT) AS tcnt FROM (
          SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
            x -> x != '')) AS term
          FROM documents)
        GROUP BY term),
      s0 AS (
        SELECT term, tcnt, i AS pos, term[i] AS sym
        FROM tc, UNNEST(generate_series(1, length(term))) AS t(i)),
      $iters
      $selects
      ORDER BY it, mrank"""
  }

  /** The 12×16 word-vocabulary iterations (tx_bpe_apply_deep's
    * oracle). */
  private def sqlBpeBatchIters: String = (1 to BpeBatchIters)
    .map(n => sqlBpeBatchIter(n, if (n == 1) "s0" else s"q${n - 1}"))
    .mkString(",")

  private def sqlBpeApplyDeep: String = s"""
      WITH tc AS (
        SELECT term, CAST(count(*) AS BIGINT) AS tcnt FROM (
          SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
            x -> x != '')) AS term
          FROM documents)
        GROUP BY term),
      s0 AS (
        SELECT term, tcnt, i AS pos, term[i] AS sym
        FROM tc, UNNEST(generate_series(1, length(term))) AS t(i)),
      $sqlBpeBatchIters
      SELECT term, tcnt, CAST(count(*) AS BIGINT) AS n_syms,
             string_agg(sym, '|' ORDER BY pos) AS segmentation
      FROM q$BpeBatchIters GROUP BY term, tcnt ORDER BY term"""

  /** The deep phrase schedule's unrolled iterations — each CTE block
    * carries ITS OWN per-iteration candidate/batch LIMITs
    * ([[bpeDeepK]]/[[bpeDeepM]]), the per-left-symbol thinning, and
    * the space-joined merged symbols: the textual twin of
    * [[bpeDeepTrainOnce]]'s loop. The doc-sequence s0 (term = doc_id,
    * sym = word) is supplied by the callers. */
  private def sqlBpeDeepIters: String = (1 to BpeDeepIters)
    .map(n => sqlBpeBatchIter(n, if (n == 1) "s0" else s"q${n - 1}",
      bpeDeepK(n), bpeDeepM(n), thin = true, sep = " ",
      chainOnly = true))
    .mkString(",")

  private def sqlBpeDeepS0: String = s"""
      s0 AS MATERIALIZED (
        SELECT doc_id AS term, CAST(1 AS BIGINT) AS tcnt, i AS pos,
               w[i] AS sym
        FROM (SELECT doc_id, string_split(text, ' ') AS w
              FROM documents WHERE doc_id % $BpeDeepSampleMod = 0),
             UNNEST(generate_series(1, len(w))) AS t(i))"""

  private def sqlBpeDeep: String = {
    val selects = (1 to BpeDeepIters)
      .map(n => s"SELECT CAST($n AS BIGINT) AS it, mrank, " +
        s"l AS left_sym, r AS right_sym, merged, pair_count FROM k$n")
      .mkString("\n      UNION ALL\n      ")
    s"""
      WITH $sqlBpeDeepS0,
      $sqlBpeDeepIters
      $selects
      ORDER BY it, mrank"""
  }

  private def sqlBpeDeepApply: String = s"""
      WITH $sqlBpeDeepS0,
      $sqlBpeDeepIters
      SELECT term AS doc_id, CAST(count(*) AS BIGINT) AS n_syms,
             string_agg(sym, '|' ORDER BY pos) AS segmentation
      FROM q$BpeDeepIters GROUP BY term ORDER BY doc_id"""

  val oracles: Map[String, String] = Map(
    "tx_bpe_batch" -> sqlBpeBatch,
    "tx_bpe_deep" -> sqlBpeDeep,
    "tx_bpe_deep_apply" -> sqlBpeDeepApply,
    "tx_bpe_apply_deep" -> sqlBpeApplyDeep,
    "dd_substring_scrub" -> """
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
      ),
      grams AS (
        SELECT doc_id, i AS s,
               CAST(concat('0x',
                 substr(md5(array_to_string(w[i:i+9], ' ')), 1, 15))
                 AS BIGINT) AS gh
        FROM toks, UNNEST(generate_series(1, len(w)-9)) AS t(i)
        WHERE len(w) >= 10
      ),
      shared AS (
        SELECT gh FROM grams GROUP BY gh HAVING min(doc_id) <> max(doc_id)
      ),
      covered AS (
        SELECT DISTINCT doc_id, s + d AS pos
        FROM grams, UNNEST(generate_series(0, 9)) AS dd(d)
        WHERE gh IN (SELECT gh FROM shared)
      ),
      cov AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed
        FROM covered GROUP BY doc_id
      ),
      words AS (
        SELECT t.doc_id, p.i AS pos, t.w[p.i] AS word
        FROM toks t, UNNEST(generate_series(1, len(t.w))) AS p(i)
      ),
      kept AS (
        SELECT ww.doc_id, string_agg(ww.word, ' ' ORDER BY ww.pos)
                 AS ktext
        FROM words ww
        LEFT JOIN covered c ON c.doc_id = ww.doc_id AND c.pos = ww.pos
        WHERE c.pos IS NULL
        GROUP BY ww.doc_id
      )
      SELECT t.doc_id,
             CAST(len(t.w) AS BIGINT) AS n_words,
             coalesce(cv.n_removed, 0) AS n_removed,
             CAST(len(t.w) - coalesce(cv.n_removed, 0) AS DOUBLE) /
               CAST(len(t.w) AS DOUBLE) AS kept_frac,
             md5(coalesce(k.ktext, '')) AS scrub_hash
      FROM toks t
      LEFT JOIN cov cv USING (doc_id)
      LEFT JOIN kept k USING (doc_id)
      ORDER BY t.doc_id""",
    "tx_bpe_merges" -> s"""
      WITH tc AS (
        SELECT term, CAST(count(*) AS BIGINT) AS tcnt FROM (
          SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
            x -> x != '')) AS term
          FROM documents)
        GROUP BY term),
      s0 AS (
        SELECT term, tcnt, i AS pos, term[i] AS sym
        FROM tc, UNNEST(generate_series(1, length(term))) AS t(i)),
      ${sqlBpeIter(1, "s0")},
      ${sqlBpeIter(2, "q1")},
      ${sqlBpeIter(3, "q2")}
      SELECT CAST(1 AS BIGINT) AS it, l AS left_sym, r AS right_sym,
             merged, pair_count FROM b1
      UNION ALL
      SELECT CAST(2 AS BIGINT), l, r, merged, pair_count FROM b2
      UNION ALL
      SELECT CAST(3 AS BIGINT), l, r, merged, pair_count FROM b3
      ORDER BY it""",
    "tx_bpe_apply" -> s"""
      WITH tc AS (
        SELECT term, CAST(count(*) AS BIGINT) AS tcnt FROM (
          SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
            x -> x != '')) AS term
          FROM documents)
        GROUP BY term),
      s0 AS (
        SELECT term, tcnt, i AS pos, term[i] AS sym
        FROM tc, UNNEST(generate_series(1, length(term))) AS t(i)),
      ${sqlBpeIter(1, "s0")},
      ${sqlBpeIter(2, "q1")},
      ${sqlBpeIter(3, "q2")}
      SELECT term, tcnt, CAST(count(*) AS BIGINT) AS n_syms,
             string_agg(sym, '|' ORDER BY pos) AS segmentation
      FROM q3 GROUP BY term, tcnt ORDER BY term""",
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
        SELECT doc_id,
               CAST(concat('0x',
                 substr(md5(array_to_string(w[i:i+9], ' ')), 1, 15))
                 AS BIGINT) AS gh
        FROM toks, UNNEST(generate_series(1, len(w)-9)) AS t(i)
        WHERE len(w) >= 10
      ),
      shared AS (
        SELECT gh FROM grams GROUP BY gh HAVING min(doc_id) <> max(doc_id)
      ),
      per_doc AS (
        SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id
      ),
      dup AS (
        SELECT doc_id, count(*) AS n_dup FROM grams
        WHERE gh IN (SELECT gh FROM shared) GROUP BY doc_id
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
    "cu_drift" -> s"""
      WITH toks AS (
        SELECT doc_id,
               CAST(concat('0x', substr(md5(w), 1, 4)) AS BIGINT) % 256
                 AS b
        FROM (SELECT doc_id, unnest($sqlToks) AS w FROM documents)
      ),
      dist AS (
        SELECT b,
               CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS ref_cnt,
               CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END)
                 AS BIGINT) AS cand_cnt
        FROM toks GROUP BY b
      ),
      totals AS (
        SELECT CAST(sum(ref_cnt) AS BIGINT) AS tot_r,
               CAST(sum(cand_cnt) AS BIGINT) AS tot_c
        FROM dist
      )
      SELECT b, ref_cnt, cand_cnt,
             (ref_cnt + 1.0) / (tot_r + 256.0) AS p_ref,
             (cand_cnt + 1.0) / (tot_c + 256.0) AS p_cand,
             round(ln((ref_cnt + 1.0) / (tot_r + 256.0)) -
                   ln((cand_cnt + 1.0) / (tot_c + 256.0)), 9)
               AS log_ratio
      FROM dist, totals ORDER BY b""",
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
