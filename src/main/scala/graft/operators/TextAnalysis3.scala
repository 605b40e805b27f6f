package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis.tokens

/** Round-4 text-pipeline completions: tokenizer-fertility budgeting and
  * the Gopher document-quality rules (Rae et al. 2021, §A1.1) — the two
  * corpus gates that run before any training-data mixture is fixed.
  */
object TextAnalysis3 extends QueryPack {

  /** Tokenizer fertility by (lang, source): subword tokens per
    * whitespace word (the BPE-ish segmentation tx_tokens established)
    * and chars per word — what a token-budget planner multiplies corpus
    * word counts by. Integer sums (exact, associative) → one double
    * division per group; a single map-side-combined aggregation.
    * Parity: the ratios are emitted as the RAW quotient (the
    * tx_classifier idiom) — exact-integer operands give identical
    * division bits in both engines, while round(·, 6) lands dyadic
    * rationals on half-way points where the engines' rounding differs.
    */
  def txFertility(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("lang"), col("source"),
        size(tokens(col("text"))).cast("long").as("ws"),
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long")
          .as("bpe"),
        length(col("text")).cast("long").as("ch"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).as("total_words"),
        sum(col("bpe")).as("total_subwords"),
        (sum(col("bpe")).cast("double") /
          sum(col("ws")).cast("double")).as("fertility"),
        (sum(col("ch")).cast("double") /
          sum(col("ws")).cast("double")).as("chars_per_word"))
      .orderBy("lang", "source")

  /** Gopher rules — canonical stopword list from the paper. */
  private val gopherStops =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher document-quality gate: word count in [50, 100k], mean word
    * length in [3, 10], ≥ 80% of words contain an alphabetic char, and
    * ≥ 2 canonical stopwords. All per-row array arithmetic (no shuffle
    * at all until the output sort); integer sums keep the means exact
    * until one double division, emitted raw (un-rounded) so the gate
    * comparisons and the emitted ratios are bitwise identical across
    * engines — round(·, 6) on these exact rationals hits half-way
    * points where Spark HALF_UP and DuckDB nearbyint disagree.
    */
  def txGopherRules(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_words"),
        aggregate(transform(col("w"), x => length(x).cast("long")),
          lit(0L), (a, b) => a + b).as("sum_len"),
        size(filter(col("w"), x => x.rlike("[a-zA-Z]"))).cast("long")
          .as("n_alpha"),
        size(filter(col("w"),
          x => x.isin(gopherStops.map(s => s: Any): _*))).cast("long")
          .as("n_stop"))
      .select(col("doc_id"), col("n_words"),
        (col("sum_len").cast("double") /
          col("n_words").cast("double")).as("mean_word_len"),
        (col("n_alpha").cast("double") /
          col("n_words").cast("double")).as("frac_alpha"),
        col("n_stop"))
      .withColumn("passes",
        col("n_words") >= 50 && col("n_words") <= 100000 &&
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
          col("frac_alpha") >= 0.8 && col("n_stop") >= 2)
      .orderBy("doc_id")

  /** Hashed-bag-of-words linear classifier weights in exact integer
    * milli-units: w_i ∈ [−1000, 1000]. A Knuth-multiplicative spread of
    * the bucket index stands in for trained weights — the OPERATOR is
    * the inference plan; swapping real fastText weights changes only
    * this table.
    */
  private val clsBuckets = 64
  private val clsWeights: IndexedSeq[Long] =
    (0 until clsBuckets).map(i => (i * 2654435761L) % 2001L - 1000L)

  /** Linear quality-classifier inference (the fastText-style filter a
    * C4/CCNet pipeline scores every document with): margin = mean
    * hashed-unigram weight + bias; keep = margin > 0.
    *
    * Scale: the weight table broadcasts as a 64-element literal array
    * and scoring is entirely in-row (md5-bucket each token, element_at
    * into the array, integer fold) — a narrow map over the corpus with
    * NO shuffle except the output sort. Float parity: weights are
    * integer milli-units summed exactly; one double division + bias at
    * the end, and no transcendental calls (margin, not sigmoid, is
    * emitted — monotone-equivalent for thresholding).
    */
  def txClassifier(spark: SparkSession, dir: String): DataFrame = {
    val wArr = array(clsWeights.map(lit): _*)
    val bucket = (x: org.apache.spark.sql.Column) =>
      conv(substring(md5(x), 1, 4), 16, 10).cast("long") % clsBuckets
    t(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .filter(size(col("w")) > 0)
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        aggregate(
          transform(col("w"),
            x => element_at(wArr, (bucket(x) + 1).cast("int"))),
          lit(0L), (a, b) => a + b).as("score_milli"))
      // NOT rounded: the division and subtraction are single IEEE ops,
      // identical bit-for-bit in both engines; round(·, 6) would land
      // exact-rational scores on half-way points where the engines'
      // rounding modes differ (observed at sf0.1: 2/5000 rows off by
      // 1e-6).
      .withColumn("margin",
        col("score_milli").cast("double") /
          (col("n_tokens").cast("double") * 1000.0) - 0.05)
      .withColumn("keep", col("margin") > 0.0)
      .orderBy("doc_id")
  }

  /** Robust outlier gate: per-language median and MAD (median absolute
    * deviation) of document length, plus the count of docs farther
    * than 3·MAD from the median — the outlier filter that survives the
    * heavy-tailed length distributions where mean/stddev gates break.
    *
    * Scale: two median passes, each a language-keyed window + one
    * aggregation (the exact-rank form); the per-language medians
    * broadcast back. At 100 TB the exact rank medians swap for
    * percentile_approx sketches — the gate logic is unchanged.
    */
  def txMadOutliers(spark: SparkSession, dir: String): DataFrame = {
    // COUNT-COMPRESSED form (opt guide §2.3/§1.2 — remove passes the
    // algorithm doesn't need): every statistic here is a function of
    // the (lang, n_chars) histogram, whose cardinality is bounded by
    // the value DOMAIN (#langs × max doc length), not the corpus — so
    // one map-side-combined aggregation replaces the two corpus-wide
    // range-shuffle median passes, and the deviation distribution
    // derives from the histogram itself (dev = |n_chars − median| is a
    // function of the histogram key), never from a second corpus scan.
    // Rank selection and interpolation are expression-identical to
    // exactMedianBy (value at rank ⌊idx⌋ / ⌊idx⌋+1, idx = 1 + 0.5(n−1))
    // so the result is bitwise what the two-pass form produced —
    // measured 1.5 s → ~0.3 s at sf0.1 with the oracle unchanged.
    val lenCnts = t(spark, dir, "documents")
      .groupBy(col("lang"), col("n_chars"))
      .agg(count(lit(1)).as("__c"))
    val med = medianOfCounts(lenCnts, "lang", "n_chars", "median_chars")
    val devCnts = lenCnts.join(broadcast(med), "lang")
      .select(col("lang"), col("median_chars"),
        abs(col("n_chars").cast("double") - col("median_chars"))
          .as("dev"),
        col("__c"))
      // two histogram cells can land on the same deviation (median ± k)
      .groupBy(col("lang"), col("median_chars"), col("dev"))
      .agg(sum(col("__c")).as("__c"))
    val mad = medianOfCounts(devCnts, "lang", "dev", "mad")
    devCnts.join(broadcast(mad), "lang")
      .groupBy("lang")
      .agg(sum(col("__c")).as("n_docs"),
        max(col("median_chars")).as("median_chars"),
        max(col("mad")).as("mad"),
        sum(when(col("dev") > lit(3.0) * col("mad"), col("__c"))
          .otherwise(0L)).as("n_outliers"))
      .orderBy("lang")
  }

  /** Exact interpolated median over a `(key, value, __c)` count table —
    * the histogram twin of [[graft.operators.exactMedianBy]] (identical
    * rank formula and interpolation expressions, so identical bits):
    * value at rank r is the row whose cumulative-count range covers r.
    * The keyed window runs over the HISTOGRAM (domain-bounded), never
    * the corpus.
    */
  private def medianOfCounts(cnts: DataFrame, key: String,
      valueCol: String, out: String): DataFrame = {
    val wOrd = Window.partitionBy(key).orderBy(valueCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(key)
    val cum = cnts
      .withColumn("__hi", sum(col("__c")).over(wOrd))
      .withColumn("__n", sum(col("__c")).over(wAll))
    val idx = lit(1.0) + lit(0.5) *
      (col("__n") - 1).cast(org.apache.spark.sql.types.DoubleType)
    val rlo = floor(idx).cast(org.apache.spark.sql.types.LongType)
    val covers = (r: Column) =>
      col("__hi") - col("__c") < r && r <= col("__hi")
    cum.groupBy(key)
      .agg(
        max(when(covers(rlo), col(valueCol))).as("__vlo"),
        max(when(covers(rlo + 1), col(valueCol))).as("__vhi"),
        max(idx - floor(idx)).as("__frac"))
      .select(col(key),
        (col("__vlo").cast(org.apache.spark.sql.types.DoubleType) +
          (coalesce(col("__vhi"), col("__vlo"))
            .cast(org.apache.spark.sql.types.DoubleType) -
            col("__vlo").cast(org.apache.spark.sql.types.DoubleType)) *
          col("__frac")).as(out))
  }


  /** PII patterns shared (as literal strings) between the Spark
    * expressions and the generated oracle SQL — a portable subset of
    * Java regex ∩ RE2: character classes, bounded repeats, ASCII \\b,
    * no lookaround. Sequence order IS redaction order: the +1 form
    * runs before the plain phone so an international number redacts
    * as one tag (its bare 10-digit tail would otherwise re-match).
    * Known, documented overlap: COUNTS run each pattern against the
    * ORIGINAL text, so a "+1-555-123-4567" contributes to both
    * n_phone_intl and n_phone (its tail matches the plain pattern) —
    * identical in both engines, so the oracle still pins it exactly.
    */
  private[graft] val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
    ("phone_intl",
      "\\+1[- .]\\d{3}[- .]\\d{3}[- .]\\d{4}\\b", "<PHONE>"),
    ("phone_paren", "\\(\\d{3}\\) ?\\d{3}[- .]\\d{4}\\b", "<PHONE>"),
    ("phone", "\\b\\d{3}[- .]\\d{3}[- .]\\d{4}\\b", "<PHONE>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("cc", "\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b", "<CC>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** Adds per-pattern match counts (n_email, n_phone, n_ip) and the
    * fully redacted text to any frame with a `text` column — the
    * per-row PII kernel shared by [[txPii]] and the spec's planted-PII
    * checks. Row-local, so batch and stream evaluate identically; the
    * redaction applies the patterns in [[piiPatterns]] order.
    */
  private[graft] def piiOf(docs: DataFrame): DataFrame = {
    val counted = piiPatterns.foldLeft(docs) { case (df, (name, pat, _)) =>
      df.withColumn(s"n_$name",
        size(regexp_extract_all(col("text"), lit(pat), lit(0)))
          .cast("long"))
    }
    counted.withColumn("redacted",
      piiPatterns.foldLeft(col("text")) { case (c, (_, pat, tag)) =>
        regexp_replace(c, lit(pat), lit(tag))
      })
  }

  /** Deterministic PII-bearing text derived INSIDE the query (one in
    * five docs gets a synthesized contact block appended — email, +1
    * and parenthesized phones, SSN-shaped, card-shaped, IPv4, all
    * keyed off doc_id), with the identical literal expression replayed
    * by the DuckDB oracle. The generated corpus itself is PII-free, so
    * without this the oracle pinned only the all-zero fixed point; the
    * plant makes the driver's hash check exercise nonzero counts and
    * REAL redaction on every fifth row. `cast` is the one spot the two
    * dialects name differently (STRING vs VARCHAR), hence the
    * parameter.
    */
  private def piiPlantSql(cast: String): String =
    "CASE WHEN doc_id % 5 = 0 THEN concat(text, ' contact user', " +
      s"CAST(doc_id AS $cast), '@example.com or call +1-555-', " +
      s"CAST(100 + doc_id % 900 AS $cast), '-4567 alt (555) 867-', " +
      s"CAST(1000 + doc_id % 9000 AS $cast), ' ssn 123-45-', " +
      s"CAST(1000 + doc_id % 9000 AS $cast), " +
      "' card 4111-1111-1111-1111 at 10.0.', " +
      s"CAST(doc_id % 256 AS $cast), '.7') ELSE text END"

  /** E7 completion — PII detection + redaction (the scrub stage every
    * production corpus runs: C4/CCNet/Dolma-style regex passes):
    * per-document match counts for every [[piiPatterns]] family and
    * the md5 of the fully redacted text (the hash keeps the exported
    * row narrow; the spec checks the redacted TEXT itself on planted
    * PII). One codegen'd map pass, no shuffle beyond the output sort.
    *
    * Fully oracle-checked AND non-vacuous: the identical pattern
    * literals run under DuckDB's RE2 ('g' flag for replace-all to
    * match Spark's regexp_replace semantics) over the identical
    * [[piiPlantSql]] text — every fifth row carries planted PII of
    * each family, so the strict compare pins real counts and real
    * redactions, not just the all-zero fixed point of the PII-free
    * generated corpus.
    */
  def txPii(spark: SparkSession, dir: String): DataFrame =
    piiOf(t(spark, dir, "documents")
        .select(col("doc_id"), expr(piiPlantSql("STRING")).as("text")))
      .select(col("doc_id") +: piiPatterns.map { case (n, _, _) =>
        col(s"n_$n") } :+ md5(col("redacted")).as("clean_hash"): _*)
      .orderBy("doc_id")

  /** Trainer geometry: 32 hashed unigram buckets + a bias feature at
    * index 32 — few enough that the Gram matrix is a driver scalar,
    * real enough that the hashed-BOW mechanics match a fastText-style
    * quality classifier. */
  private[operators] val trainBuckets = 32

  /** Planted integer annotation teacher — the fixture's stand-in for
    * human/LLM quality labels (production labels arrive as data; a
    * planted teacher gives labels with a KNOWN generating hyperplane so
    * ClassifierTrainSpec can verify the trainer LEARNS, not merely that
    * it is deterministic). Same xorshift64 stream discipline as the
    * MinHash params and the LSH planes; weights in [-8, 8). */
  private[operators] val trainTeacher: IndexedSeq[Long] = {
    var x = 0x9e3779b97f4a7c15L
    def next(): Long = { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; x }
    (0 until trainBuckets).map(_ => ((next() >>> 40) % 16L) - 8L)
  }

  /** Token features only (no bias row) — margins fold over these. */
  private def trainFeats0(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    t(spark, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .select(col("doc_id"),
        expr(s"graft_md5_prefix(t, 4) % $trainBuckets").as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("cnt"))
  }

  /** Sparse integer bag-of-words over the hashed vocabulary:
    * (doc_id, b, cnt) rows for b < 32, plus one bias row (b=32, cnt=1)
    * per tokenized doc. Shared by the query and the spec's evaluator. */
  private[graft] def trainFeats(spark: SparkSession,
      dir: String): DataFrame = {
    val f0 = trainFeats0(spark, dir)
    f0.unionByName(f0.select("doc_id").distinct()
      .select(col("doc_id"), lit(trainBuckets.toLong).as("b"),
        lit(1L).as("cnt")))
  }

  /** The planted labels: +1 iff the doc's integer teacher margin
    * exceeds the corpus's exact lower-median margin (rank
    * (n+1) div 2 via the distributed [[withRankBy]] — no
    * single-partition window), -1 otherwise. Balanced ~50/50 by
    * construction. */
  private[graft] def trainLabels(spark: SparkSession,
      dir: String): DataFrame = {
    val tArr = array(trainTeacher.map(lit): _*)
    val margins = trainFeats0(spark, dir)
      .withColumn("tw", element_at(tArr, (col("b") + 1).cast("int")))
      .groupBy("doc_id").agg(sum(col("tw") * col("cnt")).as("margin"))
    val theta = withRankBy(margins.withColumn("__k", lit(1)),
        "__k", "margin", "__rn", "__n")
      .filter(col("__rn") === expr("(__n + 1) div 2"))
      .select(col("margin").as("theta"))
    margins.crossJoin(broadcast(theta))
      .select(col("doc_id"),
        when(col("margin") > col("theta"), 1L).otherwise(-1L).as("y"))
  }

  /** Quality-classifier TRAINING twin of [[txClassifier]] — the
    * distributed half of fitting a linear text classifier at corpus
    * scale: ONE pass aggregates the exact integer sufficient
    * statistics (upper-triangle Gram matrix X'X over the hashed
    * bag-of-words features + bias, and the label moment X'y), and the
    * (B+1)x(B+1) ridge solve is a driver-side scalar — the same
    * heavy-distributed/tiny-driver split as the Lloyd centroid steps.
    * This is how linear probes and fastText-style quality gates are
    * actually trained over 100 TB: the cluster never iterates, it
    * computes moments.
    *
    * Output: (i, j, v) rows — v = Σ x_i·x_j for j ≥ i (Gram upper
    * triangle, bias included at index 32) and v = Σ x_i·y for j = -1.
    * All values are exact BIGINT sums of integer token counts, so the
    * DuckDB oracle replays them bitwise; the float solve lives in
    * ClassifierTrainSpec, which fits ridge(λ=10) on these moments and
    * pins ~95% train accuracy against the planted teacher's labels
    * (majority baseline 50%).
    *
    * Scale: the token explode + hash is one codegen'd pass; the Gram
    * self-join runs on the already-aggregated sparse rows (≤ 33 nnz
    * per doc → ≤ 561 pairs per doc) — at test SF AQE broadcasts one
    * side, at scale the two sides are the SAME subplan so the doc_id
    * exchange is planned once and reused (the standard self-join
    * shape) — with map-side partial aggregation into ≤ 594 cells; the
    * label threshold uses the distributed exact-rank median (range
    * shuffle + broadcast offsets, the q_median idiom). No driver-side
    * loops, no iteration — one round trip.
    */
  def txClassifierTrain(spark: SparkSession, dir: String): DataFrame = {
    // one derivation, renamed per side — the shared subplan is
    // guaranteed, not rediscovered by ReuseExchange (review r13)
    val f = trainFeats(spark, dir)
    val fa = f.toDF("doc_id", "bi", "ci")
    val fb = f.toDF("doc_id", "bj", "cj")
    val gram = fa.join(fb, "doc_id")
      .filter(col("bi") <= col("bj"))
      .groupBy(col("bi").as("i"), col("bj").as("j"))
      .agg(sum(col("ci") * col("cj")).as("v"))
    val xty = f.join(trainLabels(spark, dir), "doc_id")
      .groupBy(col("b").as("i"))
      .agg(sum(col("cnt") * col("y")).as("v"))
      .select(col("i"), lit(-1L).as("j"), col("v"))
    gram.unionByName(xty).orderBy("i", "j")
  }

  /** E7 — BM25 retrieval (Robertson/Sparck-Jones, k1 = 1.2, b = 0.75)
    * over the standing term-bucketed `doc_terms` model: docs 0–9 are
    * the query set (their DISTINCT terms — short-query BM25's qtf = 1
    * convention), docs ≥ 10 the searched corpus, top-10 per query.
    * The retrieval shape decontamination and eval-overlap audits run
    * at corpus scale: score every (query, doc) pair sharing a term,
    * rank, keep the head.
    *
    * Scale shape: query terms broadcast (request-sized); the candidate
    * generation is a map-side probe of the term-bucketed standing
    * model (no corpus shuffle); df is computed for the QUERY TERMS
    * ONLY (semi-join first — a full-vocab df table is
    * billions-of-terms at 100 TB and must never broadcast), so its
    * broadcast is request-bounded at any corpus size; doc lengths are
    * a map-only pass over the doc_id-bucketed standing corpus copy
    * (no corpus-side exchange — the plan-audit alternative, sum(cnt)
    * over doc_terms, re-shuffles the whole term table onto doc_id);
    * the doc-length join shuffles only the CANDIDATE rows (bounded by
    * Σ df over query terms); the final agg groups candidate rows.
    * Nothing corpus-sized moves.
    *
    * Oracle parity: idf = round(ln((N − df + ½)/(df + ½) + 1), 6) —
    * the ulp-collapse idiom for ln of a non-rational value; the
    * per-term score (identical operand bits → identical double bits:
    * only +,−,×,÷) is quantized to exact 1e-6 BIGINT units with
    * floor(x·1e6 + 0.5), summed exactly, divided ONCE at the end —
    * the established portable-sum pattern (a double sum would be
    * partition-order-dependent).
    */
  def txBm25(spark: SparkSession, dir: String): DataFrame = {
    val dt = TextAnalysis.docTerms(spark, dir)
      .select("doc_id", "term", "cnt")
    val corpusT = dt.filter(col("doc_id") >= 10)
    val qterms = dt.filter(col("doc_id") < 10)
      .select(col("doc_id").as("query_id"), col("term")).distinct()
    val dfreq = corpusT
      .join(broadcast(qterms.select("term").distinct()),
        Seq("term"), "left_semi")
      .groupBy("term").agg(count(lit(1)).as("df"))
    val dl = Curation2.docsById(spark, dir)
      .filter(col("doc_id") >= 10)
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("tot_dl"))
    val avgdl = col("tot_dl").cast("double") / col("n_docs").cast("double")
    val idf = round(log(
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5))
        / (col("df").cast("double") + lit(0.5)) + lit(1.0)), 6)
    val tfp = (col("cnt").cast("double") * lit(2.2)) /
      (col("cnt").cast("double") + lit(1.2) *
        (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl)))
    val byQ = Window.partitionBy("query_id")
      .orderBy(col("squant").desc, col("doc_id"))
    corpusT.join(broadcast(qterms), "term")
      .join(broadcast(dfreq), "term")
      .join(dl.hint("shuffle_hash"), "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("sq",
        floor(idf * tfp * lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("sq")).as("squant"))
      .withColumn("score", col("squant").cast("double") / lit(1000000.0))
      .withColumn("rank", row_number().over(byQ).cast("long"))
      .filter(col("rank") <= 10)
      .select("query_id", "doc_id", "rank", "score")
      .orderBy("query_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tx_classifier_train" -> txClassifierTrain _,
    "tx_fertility" -> txFertility _,
    "tx_gopher_rules" -> txGopherRules _,
    "tx_classifier" -> txClassifier _,
    "tx_mad_outliers" -> txMadOutliers _,
    "tx_pii" -> txPii _,
    "tx_bm25" -> txBm25 _)

  private val sqlToks =
    "list_filter(string_split_regex(text, '\\s+'), x -> x != '')"

  private def medianBy(df: DataFrame, key: String, valueCol: String,
      out: String): DataFrame = exactMedianBy(df, key, valueCol, out)

  private def sqlMedianCtes(p: String, src: String, v: String,
      out: String): String = sqlMedianByCtes(p, src, "lang", v, out)

  val oracles: Map[String, String] = Map(
    "tx_bm25" -> s"""
      WITH terms AS (
        SELECT doc_id, unnest($sqlToks) AS term FROM documents
      ),
      tf AS (
        SELECT doc_id, term, count(*) AS cnt FROM terms GROUP BY 1, 2
      ),
      q AS (
        SELECT DISTINCT doc_id AS query_id, term FROM tf WHERE doc_id < 10
      ),
      c AS (SELECT doc_id, term, cnt FROM tf WHERE doc_id >= 10),
      dfreq AS (SELECT term, count(*) AS df FROM c GROUP BY 1),
      dl AS (
        SELECT doc_id, CAST(len($sqlToks) AS BIGINT) AS dl
        FROM documents WHERE doc_id >= 10
      ),
      stats AS (SELECT count(*) AS n_docs, sum(dl) AS tot_dl FROM dl),
      scored AS (
        SELECT query_id, c.doc_id,
               CAST(floor(
                 round(ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE)
                     + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0), 6)
                 * ((CAST(cnt AS DOUBLE) * 2.2) /
                    (CAST(cnt AS DOUBLE) + 1.2 *
                     (0.25 + 0.75 * (CAST(dl AS DOUBLE) /
                       (CAST(tot_dl AS DOUBLE) /
                        CAST(n_docs AS DOUBLE))))))
                 * 1000000.0 + 0.5) AS BIGINT) AS sq
        FROM c JOIN q USING (term) JOIN dfreq USING (term)
               JOIN dl USING (doc_id), stats
      ),
      agg AS (
        SELECT query_id, doc_id, sum(sq) AS squant FROM scored
        GROUP BY 1, 2
      ),
      ranked AS (
        SELECT query_id, doc_id,
               CAST(squant AS DOUBLE) / 1000000.0 AS score,
               CAST(row_number() OVER
                 (PARTITION BY query_id ORDER BY squant DESC, doc_id)
                 AS BIGINT) AS rank
        FROM agg
      )
      SELECT query_id, doc_id, rank, score FROM ranked
      WHERE rank <= 10 ORDER BY query_id, rank""",
    "tx_classifier_train" -> {
      val tvals = trainTeacher.zipWithIndex
        .map { case (w, b) => s"($b, $w)" }.mkString(", ")
      s"""
      WITH toks AS (
        SELECT doc_id, unnest($sqlToks) AS t FROM documents
      ),
      f0 AS (
        SELECT doc_id,
               CAST(concat('0x', substr(md5(t), 1, 4)) AS BIGINT)
                 % $trainBuckets AS b,
               CAST(count(*) AS BIGINT) AS cnt
        FROM toks GROUP BY 1, 2
      ),
      f AS (
        SELECT doc_id, b, cnt FROM f0
        UNION ALL
        SELECT DISTINCT doc_id, CAST($trainBuckets AS BIGINT),
               CAST(1 AS BIGINT)
        FROM f0
      ),
      tw AS (SELECT * FROM (VALUES $tvals) t(b, w)),
      m AS (
        SELECT f0.doc_id, sum(tw.w * f0.cnt) AS margin
        FROM f0 JOIN tw ON f0.b = tw.b GROUP BY 1
      ),
      th AS (
        SELECT margin AS theta FROM (
          SELECT margin, row_number() OVER (ORDER BY margin) AS rn,
                 count(*) OVER () AS n FROM m)
        WHERE rn = (n + 1) // 2
      ),
      y AS (
        SELECT m.doc_id,
               CASE WHEN m.margin > th.theta THEN 1 ELSE -1 END AS y
        FROM m CROSS JOIN th
      )
      SELECT i, j, v FROM (
        SELECT a.b AS i, bb.b AS j,
               CAST(sum(a.cnt * bb.cnt) AS BIGINT) AS v
        FROM f a JOIN f bb ON a.doc_id = bb.doc_id AND a.b <= bb.b
        GROUP BY 1, 2
        UNION ALL
        SELECT f.b AS i, CAST(-1 AS BIGINT) AS j,
               CAST(sum(f.cnt * y.y) AS BIGINT) AS v
        FROM f JOIN y ON f.doc_id = y.doc_id GROUP BY 1
      ) ORDER BY i, j"""
    },
    "tx_mad_outliers" -> s"""
      WITH d AS (SELECT lang, n_chars FROM documents),
      ${sqlMedianCtes("a", "d", "n_chars", "median_chars")},
      dev AS (
        SELECT d.lang, n_chars, median_chars,
               abs(CAST(n_chars AS DOUBLE) - median_chars) AS dev
        FROM d JOIN amed ON d.lang = amed.lang),
      ${sqlMedianCtes("b", "dev", "dev", "mad")}
      SELECT dev.lang, count(*) AS n_docs,
             max(median_chars) AS median_chars,
             max(mad) AS mad,
             CAST(sum(CASE WHEN dev > 3.0 * mad THEN 1 ELSE 0 END)
               AS BIGINT) AS n_outliers
      FROM dev JOIN bmed ON dev.lang = bmed.lang
      GROUP BY dev.lang ORDER BY dev.lang""",
    "tx_classifier" -> {
      val arr = clsWeights.mkString("[", ", ", "]")
      s"""
      WITH d AS (
        SELECT doc_id, $sqlToks AS w FROM documents
      ),
      scored AS (
        SELECT doc_id,
               CAST(len(w) AS BIGINT) AS n_tokens,
               CAST(list_aggregate(list_transform(w,
                 x -> ($arr)[CAST(
                   CAST(concat('0x', substr(md5(x), 1, 4)) AS BIGINT)
                     % $clsBuckets AS INTEGER) + 1]),
                 'sum') AS BIGINT) AS score_milli
        FROM d WHERE len(w) > 0)
      SELECT doc_id, n_tokens, score_milli,
             CAST(score_milli AS DOUBLE) /
               (CAST(n_tokens AS DOUBLE) * 1000.0) - 0.05 AS margin,
             (CAST(score_milli AS DOUBLE) /
               (CAST(n_tokens AS DOUBLE) * 1000.0) - 0.05 > 0.0)
               AS keep
      FROM scored ORDER BY doc_id"""
    },
    "tx_fertility" -> s"""
      WITH d AS (
        SELECT lang, source,
               CAST(len($sqlToks) AS BIGINT) AS ws,
               CAST(len(regexp_extract_all(lower(text),
                 '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS bpe,
               CAST(length(text) AS BIGINT) AS ch
        FROM documents)
      SELECT lang, source, count(*) AS n_docs,
             CAST(sum(ws) AS BIGINT) AS total_words,
             CAST(sum(bpe) AS BIGINT) AS total_subwords,
             CAST(sum(bpe) AS DOUBLE) / CAST(sum(ws) AS DOUBLE)
               AS fertility,
             CAST(sum(ch) AS DOUBLE) / CAST(sum(ws) AS DOUBLE)
               AS chars_per_word
      FROM d GROUP BY lang, source ORDER BY lang, source""",
    "tx_gopher_rules" -> {
      val stops = gopherStops.map(s => s"'$s'").mkString(", ")
      s"""
      WITH d AS (SELECT doc_id, $sqlToks AS w FROM documents),
      m AS (
        SELECT doc_id,
               CAST(len(w) AS BIGINT) AS n_words,
               CAST(list_aggregate(list_transform(w, x -> length(x)),
                 'sum') AS BIGINT) AS sum_len,
               CAST(len(list_filter(w,
                 x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT)
                 AS n_alpha,
               CAST(len(list_filter(w, x -> x IN ($stops))) AS BIGINT)
                 AS n_stop
        FROM d)
      SELECT doc_id, n_words,
             CAST(sum_len AS DOUBLE) / CAST(n_words AS DOUBLE)
               AS mean_word_len,
             CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE)
               AS frac_alpha,
             n_stop,
             (n_words >= 50 AND n_words <= 100000
              AND CAST(sum_len AS DOUBLE) /
                    CAST(n_words AS DOUBLE) >= 3.0
              AND CAST(sum_len AS DOUBLE) /
                    CAST(n_words AS DOUBLE) <= 10.0
              AND CAST(n_alpha AS DOUBLE) /
                    CAST(n_words AS DOUBLE) >= 0.8
              AND n_stop >= 2) AS passes
      FROM m ORDER BY doc_id"""
    },
    "tx_pii" -> {
      val counts = piiPatterns.map { case (n, pat, _) =>
        s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT)" +
          s" AS n_$n"
      }.mkString(",\n             ")
      val redacted = piiPatterns.foldLeft("text") {
        case (acc, (_, pat, tag)) =>
          s"regexp_replace($acc, '$pat', '$tag', 'g')"
      }
      s"""
      WITH d AS (
        SELECT doc_id, ${piiPlantSql("VARCHAR")} AS text FROM documents
      )
      SELECT doc_id,
             $counts,
             md5($redacted) AS clean_hash
      FROM d ORDER BY doc_id"""
    })
}
