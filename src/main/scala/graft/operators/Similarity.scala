package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column (driver-mandated §2e E6):
  * brute-force cosine top-k as the correctness baseline, and a
  * random-hyperplane-LSH bucketed variant as the 100 TB path.
  *
  * Scale: brute force is queries × corpus — fine for a bounded query set
  * (broadcast the queries, scan the corpus once; the per-partition top-k
  * heap keeps the shuffle at k·partitions rows). The LSH variant hashes
  * the corpus once (linear) and only scores within matching buckets —
  * the same structure an IVF index gives; bucket width trades recall for
  * scan fraction.
  */
object Similarity extends QueryPack {

  /** E6a — brute-force cosine top-k: 10 query vectors (vec_id < 10)
    * against the rest of the corpus, top 5 each. Oracle-checked bitwise
    * (sequential-fold dot product, and [[clampCos]] on the quotient —
    * identical-vector pairs land 1 ulp ABOVE 1.0, which DuckDB's
    * list_cosine_similarity clamps away).
    */
  def simBruteTopk(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val e = t(spark, dir, "embeddings")
      .withColumn("norm",
        sqrt(expr("graft_dot_product(embedding, embedding)")))
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("norm").as("q_norm"))
    val candidates = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("neighbor_id"),
        col("embedding").as("c_emb"), col("norm").as("c_norm"))
    val byQuery = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    candidates.join(broadcast(queries))
      .withColumn("cosine",
        clampCos(expr("graft_dot_product(q_emb, c_emb)") /
          (col("q_norm") * col("c_norm"))))
      .withColumn("rank", row_number().over(byQuery).cast("long"))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id", "rank", "cosine")
      .orderBy("query_id", "rank")
  }

  /** 8 hyperplanes × 64 dims of integer-valued coefficients in
    * [-500, 500] from a fixed xorshift64 seed. Integer-valued doubles
    * are exactly representable, and the same literals are interpolated
    * into both the Spark expression and the oracle SQL — so the plane
    * dot products (sequential folds in both engines) agree bitwise.
    */
  private[operators] val planes: IndexedSeq[IndexedSeq[Int]] = {
    var x = 0x243f6a8885a308d3L
    def next(): Long = { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; x }
    IndexedSeq.fill(8, 64)((math.floorMod(next(), 1001L) - 500L).toInt)
  }

  /** E6b — LSH-bucketed ANN: 8 random-hyperplane sign bits per vector,
    * multi-probe on the query side (the exact bucket plus its 8
    * Hamming-1 neighbors — the bits most likely to have flipped for a
    * true neighbor near a plane), then exact cosine re-ranking within
    * the probed buckets. Multi-probe is the standard recall lever that
    * avoids building extra hash tables: 9 of 256 buckets ≈ 3.5% scan
    * fraction, and it lifted measured recall@5 on the sf0.001 fixture
    * from 0.02 (exact-bucket only) to the value ApproxQualitySpec pins.
    * Fully oracle-checked: the plane matrix is a literal shared with
    * the generated DuckDB SQL, the probe set is a literal XOR fan-out,
    * and the sign-bit dot products fold sequentially in both engines,
    * so bucket assignments — hence candidates, ranks and cosines —
    * match exactly.
    *
    * Scale: bucketing is one linear codegen'd pass over the corpus; the
    * probe fan-out multiplies only the tiny broadcast query side (9
    * rows per query); the join shuffles on the bucket key only, and
    * scoring is quadratic only within a bucket — the same structure an
    * IVF index gives, with bucket width (bits) and probe radius trading
    * recall for scan fraction.
    */
  private[operators] val lshFlips: Seq[Long] = 0L +: (0 until 8).map(1L << _)

  def simLshTopk(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val e = t(spark, dir, "embeddings")
    val bucketSql = (0 until 8).map { p =>
      val arr = planes(p).map(c => s"${c}.0D").mkString(",")
      s"(CASE WHEN graft_dot_product(CAST(embedding AS ARRAY<DOUBLE>), " +
        s"array($arr)) > 0.0D THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")
    val e2 = e
      .withColumn("bucket", expr(s"CAST($bucketSql AS BIGINT)"))
      .withColumn("norm",
        sqrt(expr("graft_dot_product(embedding, embedding)")))
    val probes = array(lshFlips.map(f => lit(f)): _*)
    val queries = e2.filter(col("vec_id") < 10)
      .withColumn("flip", explode(probes))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("norm").as("q_norm"),
        expr("CAST(bucket ^ flip AS BIGINT)").as("bucket"))
    val candidates = e2.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("neighbor_id"),
        col("embedding").as("c_emb"), col("norm").as("c_norm"),
        col("bucket"))
    val byQuery = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    candidates.join(broadcast(queries), Seq("bucket"))
      .withColumn("cosine",
        clampCos(expr("graft_dot_product(q_emb, c_emb)") /
          (col("q_norm") * col("c_norm"))))
      .withColumn("rank", row_number().over(byQuery).cast("long"))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id", "rank", "cosine")
      .orderBy("query_id", "rank")
  }

  /** E6c — IVF-style ANN (the other standard 100 TB path next to LSH):
    * K coarse centroids seeded by deterministic stride sampling —
    * K, the seed stride and the probe width all DERIVE from the corpus
    * count ([[ivfParams]]: K ≈ √N, stride ≈ N/K, nprobe ≈ √K), so the
    * index geometry scales with the data instead of freezing at a
    * fixture-sized constant — then refined by ONE
    * Lloyd iteration in a bitwise-portable form: each cell's refined
    * centroid is the per-dimension SUM of its members' values
    * integer-quantized to 1e-7 units — cosine is scale-invariant, so
    * the sum stands in for the mean with no division, and exact BIGINT
    * sums are partition-order-independent, which a double mean is not.
    * Every vector then assigns to its max-cosine refined cell, queries
    * probe their 2 nearest cells, exact cosine re-rank within the
    * probed cells. The refinement lifted measured recall@5 on the
    * sf0.001 fixture from 0.42 to 0.56 at an unchanged ~25% scan
    * fraction (pinned by ApproxQualitySpec) — sampled seeds make
    * ragged Voronoi cells; one Lloyd step rounds them.
    *
    * Fully oracle-checked: seed choice, quantized sums, assignments,
    * probes and re-ranks are all integer arithmetic + sequential-fold
    * cosine + row_number — DuckDB replays them exactly.
    *
    * Scale: both assignment passes are broadcast nested loops (K·N dot
    * products, linear passes); the refinement aggregate shuffles
    * (cell, dim) partial sums only — 64·K rows after map-side combine;
    * the candidate join shuffles on the cell id only; scan fraction ≈
    * nprobe/K of the corpus per query. At 100 TB, K grows to ~√N and
    * more Lloyd rounds chain the same two stages — the plan shape
    * (assign → quantized-sum → assign → cell join → windowed top-k) is
    * unchanged. The centroids and the cell-assigned corpus are STANDING
    * A-layer models (built once per process, cell-bucketed parquet) —
    * the build-once/query-many shape of a real vector index: a query
    * run only scores its 10 probes against the pre-clustered index,
    * with no corpus-side assignment or exchange.
    */
  /** Scale-derived IVF geometry: K = max(8, ⌈√N⌉) coarse cells (the
    * standard IVF sizing — cell population ≈ √N keeps both the
    * within-cell pair work of the blocked near-dup and the per-probe
    * scan sublinear), seed stride = ⌊N/K⌋ (≈K evenly-spaced seeds over
    * the contiguous id range), nprobe = max(2, ⌈√K⌉) (probe budget
    * grows with the cell count so recall holds while the scanned
    * FRACTION, nprobe/K ≈ K^{-1/2}, still shrinks as the corpus
    * grows). All four values are integer-deterministic functions of
    * the corpus count, recomputed identically by the DuckDB oracle
    * ([[sqlIvfCtes]]'s ivf_params CTE), and recorded in the standing
    * models' metadata — the model NAME carries K, so when ingest moves
    * N across a K boundary the standing index is a different model and
    * rebuilds rather than silently serving a stale geometry.
    */
  private[graft] final case class IvfParams(
      nc: Long, k: Int, stride: Long, nprobe: Int)

  private val ivfParamsCache =
    scala.collection.concurrent.TrieMap.empty[String, IvfParams]

  // a corpus rewrite/append that goes through Shared.invalidate must
  // also drop the cached geometry: a fresh resolve then re-derives K
  // from the GROWN count, and a crossed K boundary surfaces as a new
  // model name → rebuild (the StandingIngest contract). In-process
  // streaming appends deliberately do NOT invalidate — the cached K is
  // the retained-centroid policy.
  Shared.onInvalidate(dir => { ivfParamsCache.remove(dir); () })

  /** One count() per (process, sf dir) at index-build/probe entry —
    * driver-side scalar index sizing, the same coordination any vector
    * index build does; parquet count is a metadata-cheap job. Cached
    * per dir for the life of the process; a production deployment
    * invalidates through the A-layer version chain on ingest.
    */
  private[graft] def ivfParams(spark: SparkSession,
      dir: String): IvfParams = {
    // schema-only walks skip the sizing count; fixed stand-in geometry,
    // deliberately NOT cached so a later real query re-derives the true
    // params
    if (Shared.schemaOnly(spark) && !ivfParamsCache.contains(dir))
      return IvfParams(1024L, 32, 32L, 6)
    ivfParamsCache.getOrElseUpdate(dir, {
      val nc = t(spark, dir, "embeddings")
        .filter(col("vec_id") >= 10).count()
      // K = √N capped by a MINIMUM cell population of 32 (ADVICE r8:
      // pure √N over-partitions tiny corpora — fixture-scale recall@5
      // dropped a third when K=√N landed cells of ~20; the N/32 cap
      // only binds below N = 1024, so cluster-scale geometry is
      // unchanged), floored at 8 cells
      val k = math.max(8L, math.min(
        math.ceil(math.sqrt(nc.toDouble)).toLong, nc / 32L)).toInt
      val stride = math.max(1L, nc / k)
      val nprobe = math.max(2, math.ceil(math.sqrt(k.toDouble)).toInt)
      IvfParams(nc, k, stride, nprobe)
    })
  }

  /** Embeddings as double arrays with norms — the shared scan of the
    * ANN family. */
  private def embNorm(spark: SparkSession, dir: String): DataFrame =
    embNormOf(t(spark, dir, "embeddings"))

  /** Lloyd refinement rounds for the standing IVF centroids (VERDICT
    * r8 #9). The round count is FIXED, not ε-stopped: every round is
    * bitwise-portable (integer-quantized member sums), so a fixed R
    * keeps the DuckDB oracle a mechanical unroll of the same chain,
    * where a data-dependent stop would need conditional CTEs no SQL
    * engine expresses. The measured recall@5 gain of the second round
    * is pinned in ApproxQualitySpec at an unchanged scan budget. Rides
    * the standing-model NAME (`…_r<R>`) like the K geometry, so
    * changing R rebuilds rather than serving stale cells.
    */
  private[graft] val LloydRounds = 2

  /** Lloyd-refined IVF centroids (K rows) — build function of the
    * standing `graft_ivf_cents_k<K>_r<R>` model: seed sampling, then
    * [[LloydRounds]] × (max-cosine assign → integer-quantized
    * per-dimension member sums). Cosine is scale-invariant, so the
    * exact BIGINT sum stands in for the mean with no division and is
    * partition-order-independent — every round replays bitwise in
    * DuckDB ([[sqlIvfCtes]] unrolls the identical chain).
    */
  private def ivfRefinedCents(spark: SparkSession,
      dir: String): DataFrame = {
    val p = ivfParams(spark, dir)
    val e = embNorm(spark, dir).filter(col("vec_id") >= 10)
    var cents = e
      .filter((col("vec_id") - 10) % p.stride === 0)
      .orderBy("vec_id").limit(p.k)
      .select(col("vec_id").as("cell"), col("emb").as("cent_emb"),
        col("norm").as("cent_norm"))
    val byVec = Window.partitionBy("vec_id")
      .orderBy(col("cos_c").desc, col("cell"))
    for (_ <- 1 to LloydRounds) {
      // members take their max-cosine cell against the current
      // centroids (round 1: the sampled seeds)
      val members = e.join(broadcast(cents))
        .withColumn("cos_c",
          clampCos(expr("graft_dot_product(emb, cent_emb)") /
            (col("norm") * col("cent_norm"))))
        .withColumn("crank", row_number().over(byVec))
        .filter(col("crank") === 1)
        .select(col("cell"), col("emb"))
      // one Lloyd step: per-dimension integer-quantized member sums
      cents = members
        .select(col("cell"), posexplode(col("emb")).as(Seq("pos", "v")))
        .withColumn("vq", expr("CAST(floor(v * 10000000.0D) AS BIGINT)"))
        .groupBy("cell", "pos").agg(sum(col("vq")).as("cs"))
        .groupBy("cell")
        .agg(expr("transform(array_sort(collect_list(struct(pos, cs)))," +
          " x -> CAST(x.cs AS DOUBLE))").as("cent_emb"))
        .withColumn("cent_norm",
          sqrt(expr("graft_dot_product(cent_emb, cent_emb)")))
    }
    cents
  }

  /** Standing refined-centroid model (K rows); the name carries the
    * derived K so an N that crosses a K boundary versions a NEW model
    * (rebuild-on-geometry-change), and the derivation inputs ride the
    * model meta for audit. */
  private[graft] def ivfCentsModel(spark: SparkSession,
      dir: String): DataFrame = {
    val p = ivfParams(spark, dir)
    Shared.model(spark, dir, s"graft_ivf_cents_k${p.k}_r$LloydRounds",
      "cell",
      (s, d) => ivfRefinedCents(s, d),
      extraMeta = Map("ivf_nc" -> p.nc.toString,
        "ivf_rounds" -> LloydRounds.toString,
        "ivf_k" -> p.k.toString, "ivf_stride" -> p.stride.toString,
        "ivf_nprobe" -> p.nprobe.toString),
      inputs = Seq("embeddings"))
  }

  /** Standing IVF index: every corpus vector in its max-cosine refined
    * cell, bucketed on the cell id — built once per process, so query
    * runs join pre-clustered parquet with no corpus-side exchange (the
    * build-once/query-many shape a real vector index has).
    */
  private[graft] def ivfIndexModel(spark: SparkSession,
      dir: String): DataFrame = {
    val p = ivfParams(spark, dir)
    Shared.model(spark, dir,
      s"graft_ivf_index_k${p.k}_r$LloydRounds", "cell",
      (s, d) => ivfAssign(embNorm(s, d).filter(col("vec_id") >= 10),
        ivfCentsModel(s, d)),
      extraMeta = Map("ivf_nc" -> p.nc.toString,
      "ivf_k" -> p.k.toString, "ivf_nprobe" -> p.nprobe.toString),
      inputs = Seq("embeddings"))
  }

  /** Max-cosine cell assignment of a normalized (vec_id, emb, norm)
    * frame against a centroid frame — the build kernel of
    * [[ivfIndexModel]], shared with [[StandingIngest]]'s per-batch
    * assignment append (a new vector's index row depends only on its
    * own embedding and the retained centroids, so append ≡ rebuild
    * under the fixed-centroid policy). */
  private[graft] def ivfAssign(e: DataFrame, cents: DataFrame)
      : DataFrame = {
    val byVec = Window.partitionBy("vec_id")
      .orderBy(col("cos_c").desc, col("cell"))
    e.join(broadcast(cents))
      .withColumn("cos_c",
        clampCos(expr("graft_dot_product(emb, cent_emb)") /
          (col("norm") * col("cent_norm"))))
      .withColumn("crank", row_number().over(byVec))
      .filter(col("crank") === 1)
      .select(col("vec_id").as("neighbor_id"),
        col("emb").as("c_emb"), col("norm").as("c_norm"), col("cell"))
  }

  /** Normalized double-cast view of any (vec_id, embedding) frame —
    * the [[embNorm]] kernel over a batch instead of the table. */
  private[graft] def embNormOf(batch: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(batch.sparkSession)
    batch
      .select(col("vec_id"),
        expr("CAST(embedding AS ARRAY<DOUBLE>)").as("emb"))
      .withColumn("norm", sqrt(expr("graft_dot_product(emb, emb)")))
  }

  /** A query frame's nprobe nearest refined cells — (query_id, q_emb,
    * q_norm, cell), one row per probed cell. Split out of [[ivfProbe]]
    * so ApproxQualitySpec can measure the TRUE scanned fraction (the
    * summed population of exactly these cells) rather than a
    * balanced-cell estimate. */
  private[graft] def ivfQueryCells(spark: SparkSession, dir: String,
      queries: DataFrame): DataFrame = {
    val p = ivfParams(spark, dir)
    val cents = ivfCentsModel(spark, dir)
    val byVec = Window.partitionBy("query_id")
      .orderBy(col("cos_c").desc, col("cell"))
    queries.join(broadcast(cents))
      .withColumn("cos_c",
        clampCos(expr("graft_dot_product(emb, cent_emb)") /
          (col("norm") * col("cent_norm"))))
      .withColumn("crank", row_number().over(byVec))
      .filter(col("crank") <= p.nprobe)
      .select(col("query_id"),
        col("emb").as("q_emb"), col("norm").as("q_norm"), col("cell"))
  }

  /** Every standing-index member above `minCos` cosine within a query
    * frame's probed cells — the NEAR-DUP flavor of [[ivfProbe]] (no
    * top-k cap: an incremental dup check needs every match, not the 5
    * best; self-matches are excluded so corpus members can re-check
    * themselves). An exact re-ingested duplicate is always found: an
    * identical vector's nearest cell IS its original's assignment
    * cell. Shared by the batch `dd_embedding_incremental` and the
    * streaming [[graft.streaming.StreamAnn.dupBatch]] — row-local per
    * query, so batch ≡ stream.
    */
  private[graft] def ivfDupProbe(spark: SparkSession, dir: String,
      queries: DataFrame, minCos: Double = 0.95): DataFrame = {
    val queryCells = ivfQueryCells(spark, dir, queries)
    ivfIndexModel(spark, dir).join(broadcast(queryCells), Seq("cell"))
      .withColumn("cosine",
        clampCos(expr("graft_dot_product(q_emb, c_emb)") /
          (col("q_norm") * col("c_norm"))))
      .filter(col("cosine") > minCos &&
        col("neighbor_id") =!= col("query_id"))
      .select(col("query_id").as("new_vec"),
        col("neighbor_id").as("index_vec"), col("cosine"))
  }

  /** Probe the standing IVF index with an arbitrary (query_id, emb,
    * norm) frame — the per-query kernel shared by [[simIvfTopk]] and
    * the streaming probe ([[graft.streaming.StreamAnn]]): a query's
    * result depends only on its own vector and the standing index, so
    * batch and stream produce identical rows.
    */
  private[graft] def ivfProbe(spark: SparkSession, dir: String,
      queries: DataFrame): DataFrame = {
    val queryCells = ivfQueryCells(spark, dir, queries)
    val byQuery = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    ivfIndexModel(spark, dir).join(broadcast(queryCells), Seq("cell"))
      .withColumn("cosine",
        clampCos(expr("graft_dot_product(q_emb, c_emb)") /
          (col("q_norm") * col("c_norm"))))
      .withColumn("rank", row_number().over(byQuery).cast("long"))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id", "rank", "cosine")
      .orderBy("query_id", "rank")
  }

  def simIvfTopk(spark: SparkSession, dir: String): DataFrame =
    ivfProbe(spark, dir, embNorm(spark, dir)
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("emb"), col("norm")))

  /** E6d — product-quantization ANN (the memory-bound 100 TB path: PQ
    * codes are ~8 bytes/vector vs 256 for the raw floats, so a shard's
    * index fits executor RAM): the 64-dim space splits into 16
    * subspaces of 4 dims; each subspace quantizes to the nearest of 16
    * sub-centroids — seeded from deterministically-sampled vectors,
    * then TRAINED by one Lloyd iteration in the bitwise-portable form
    * (per-dimension member means as exact integer sums quantized to
    * 1e-7 units, one double division, floor — no order-dependent
    * double accumulation). A corpus vector is its 16 codes (16 × 4
    * bits — the 8-byte budget held throughout; sampled 8×8 codebooks
    * measured recall@5 0.10, sampled 16×16 0.14, trained 16×16 0.22,
    * pinned by ApproxQualitySpec). Queries stay unquantized and score
    * by asymmetric distance (ADC): approx L2² = Σ_m ‖q_sub(m) −
    * centroid(code_m)‖², looked up from a per-query table of 16×16
    * precomputed sub-distances.
    *
    * Fully oracle-checked: sub-distances are sequential-fold dot
    * products of exact double differences, the codebook training is
    * integer arithmetic plus two exact single divisions per dimension,
    * the ADC sum adds the 16 per-subspace terms in a fixed order
    * (CASE-pivot then s0+…+s15 — a grouped sum over doubles would be
    * partition-order-dependent), and every argmin tie-breaks on
    * centroid id.
    *
    * Scale: both encoding passes are broadcast map passes (K·M
    * sub-distances per vector, no shuffle); training shuffles only
    * (m, code, dim) partial sums — M·K·4 rows after map-side combine;
    * the ADC table is queries×256 rows and broadcasts; scoring is a
    * map over the code table + one grouped fixed-width sum — the
    * corpus never moves. The codebook and the encoded corpus are
    * STANDING A-layer models (built once per process; codes bucketed
    * on neighbor_id, so the per-query ADC aggregation groups in place)
    * — a real PQ index is exactly this pair of tables.
    */
  // ‖v−c‖² = vv + cc − 2 v·c over codegen'd slice + dot-product
  // expressions, with vv/cc precomputed ONCE per subvector /
  // sub-centroid instead of per pair — the additions keep the exact
  // order (vv + cc) − 2d of the oracle's three-dot formulation, so sd
  // is bit-identical while each joined row pays one 4-dim dot and
  // zero slice allocations. (Measured and rejected: a transform()
  // lambda of per-dim differences folded by dot(d,d) — the
  // interpreted higher-order function allocates a per-row scratch
  // array, and at local[32] the allocation+GC churn made the FIRST
  // run 25 s vs 5 s at local[4]; the norm identity keeps every term
  // inside whole-stage codegen.)
  private val sdExpr = (col("vv") + col("cc") -
    lit(2.0) * expr("graft_dot_product(vs, cs)")).as("sd")

  /** Per (vector, subspace): the sliced subvector and its norm² — 16
    * rows per vector, computed once and joined against codebooks. */
  private def pqVsubs(spark: SparkSession, dir: String): DataFrame =
    embNorm(spark, dir)
      .select(col("vec_id"), explode(sequence(lit(0), lit(15))).as("m"),
        col("emb"))
      .withColumn("vs", expr("slice(emb, m * 4 + 1, 4)"))
      .withColumn("vv", expr("graft_dot_product(vs, vs)"))
      .select("vec_id", "m", "vs", "vv")

  /** Sample-trained PQ codebook (M·K rows) — build function of the
    * standing `graft_pq_codebook` model. */
  private def pqTrainedCodebook(spark: SparkSession,
      dir: String): DataFrame = {
    val e = embNorm(spark, dir).select("vec_id", "emb")
    val seeds = e.filter(col("vec_id") >= 10 && col("vec_id") % 59 === 0)
      .orderBy("vec_id").limit(16)
      .select(col("vec_id").as("cent_id"), col("emb").as("cent_emb"))
    val seedSubs = seeds
      .select(col("cent_id"), explode(sequence(lit(0), lit(15))).as("m"),
        col("cent_emb"))
      .withColumn("cs", expr("slice(cent_emb, m * 4 + 1, 4)"))
      .withColumn("cc", expr("graft_dot_product(cs, cs)"))
      .select("cent_id", "m", "cs", "cc")
    // pass 1: assign the TRAINING SAMPLE's subvectors (a third of the
    // corpus — codebooks train on samples at any scale; measured
    // recall is unchanged vs full-corpus training) to the seed codebook
    // (argmin per (vector, subspace) as a lexicographic struct-min
    // hash aggregate — same (sd, cent_id) tie-break as a row_number
    // window without the per-partition sort)
    val codes0 = pqVsubs(spark, dir)
      .filter(col("vec_id") >= 10 && col("vec_id") % 3 === 0)
      .join(broadcast(seedSubs), "m")
      .select(col("vec_id"), col("cent_id"), col("m"), sdExpr)
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("sd"), col("cent_id"))).as("mc"))
      .select(col("vec_id"), col("m"), col("mc.cent_id").as("code"))
    // one Lloyd step per subspace: per-dimension quantized member mean
    // — exact BIGINT sums of 1e-7-unit values, one double division,
    // floor; both engines compute identical bits
    codes0.join(e, "vec_id")
      .select(col("m"), col("code"),
        explode(sequence(lit(0), lit(3))).as("pos"), col("emb"))
      .withColumn("v", expr("emb[m * 4 + pos]"))
      .groupBy("m", "code", "pos")
      .agg(sum(expr("CAST(floor(v * 10000000.0D) AS BIGINT)")).as("s"),
        count(lit(1)).as("n"))
      .withColumn("cd", expr(
        "CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) + 0.5D)" +
          " AS DOUBLE) / 10000000.0D"))
      .groupBy("m", "code")
      .agg(expr("transform(array_sort(collect_list(struct(pos, cd)))," +
        " x -> x.cd)").as("cs"))
      .withColumn("cc", expr("graft_dot_product(cs, cs)"))
  }

  /** Standing trained codebook (M·K rows). */
  private[graft] def pqCodebookModel(spark: SparkSession,
      dir: String): DataFrame =
    Shared.model(spark, dir, "graft_pq_codebook", "m",
      (s, d) => pqTrainedCodebook(s, d), inputs = Seq("embeddings"))

  /** Standing encoded corpus: each corpus vector's 16 codes, bucketed
    * on neighbor_id so the per-query ADC aggregation groups in place —
    * with the codebook, this pair of tables IS the PQ index. */
  private[graft] def pqCodesModel(spark: SparkSession,
      dir: String): DataFrame =
    Shared.model(spark, dir, "graft_pq_codes", "neighbor_id", { (s, d) =>
      pqVsubs(s, d).filter(col("vec_id") >= 10)
        .join(broadcast(pqCodebookModel(s, d)), "m")
        .select(col("vec_id"), col("code"), col("m"), sdExpr)
        .groupBy(col("vec_id"), col("m"))
        .agg(min(struct(col("sd"), col("code"))).as("mc"))
        .select(col("vec_id").as("neighbor_id"), col("m").as("cm"),
          col("mc.code").as("code"))
    }, inputs = Seq("embeddings"))

  def simPqTopk(spark: SparkSession, dir: String): DataFrame = {
    val codes = pqCodesModel(spark, dir)
    val qd = pqVsubs(spark, dir).filter(col("vec_id") < 10)
      .join(broadcast(pqCodebookModel(spark, dir)), "m")
      .select(col("vec_id").as("query_id"), col("m"),
        col("code").as("qcode"), sdExpr)
    val perSub = (0 until 16).map(i =>
      sum(when(col("m") === i, col("sd"))).as(s"s$i"))
    val byQuery = Window.partitionBy("query_id")
      .orderBy(col("approx_dist"), col("neighbor_id"))
    codes.join(broadcast(qd),
        codes("cm") === qd("m") && codes("code") === qd("qcode"))
      .groupBy("query_id", "neighbor_id")
      .agg(perSub.head, perSub.tail: _*)
      .withColumn("approx_dist",
        (0 until 16).map(i => col(s"s$i")).reduce(_ + _))
      .withColumn("rank", row_number().over(byQuery).cast("long"))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id", "rank", "approx_dist")
      .orderBy("query_id", "rank")
  }

  /** E6d3 — IVF-PQ composed ANN: the production large-index layout
    * (FAISS `IVFx,PQy`): IVF bounds WHICH vectors are scanned
    * (nprobe/K of the corpus), PQ bounds the BYTES per scanned vector
    * (16 codes ≈ 8 B vs 256 B of floats) — composed, a 100 TB index
    * probe reads ~nprobe/K · 3% of the raw bytes. Standing state is
    * ONE new model: the encoded corpus re-keyed by IVF cell
    * ([[ivfPqCodesModel]], bucketed on cell so the per-cell ADC scan
    * aggregates in place); the codebook and centroids are the existing
    * [[pqCodebookModel]] / [[ivfCentsModel]] standing models. The
    * probe is the same shape as [[simIvfTopk]] — query cells and the
    * per-query 16×16 ADC table both broadcast (queries × 256 rows),
    * the code table never moves — scoring is one broadcast-joined scan
    * over the probed cells' codes plus a fixed-width pivot sum.
    *
    * Fully oracle-checked like its two parents: the cell chain is
    * [[sqlIvfCtes]], the PQ chain is [[sqlPqCtes]], the ADC sum adds
    * 16 CASE-pivoted terms in fixed order. Quality/scan-fraction
    * pinned in ApproxQualitySpec (recall trades as IVF recall × PQ
    * code resolution; both parents' numbers bound it).
    */
  /** Ingest/retract posture: this composed model is NOT in the
    * embedding append/retract capture lists — on any corpus change its
    * fingerprint (keyed on the embeddings listing) lapses and the next
    * touch rebuilds, which is one join of the two MAINTAINED standing
    * models it derives from (no re-training, no re-encoding). The name
    * carries K like the IVF index, so a K-boundary crossing rebuilds
    * under a new name by construction. An O(batch) append lane
    * (mirroring the index's) is possible but unearned while the
    * rebuild is a cheap derived join.
    */
  private[graft] def ivfPqCodesModel(spark: SparkSession,
      dir: String): DataFrame = {
    val p = ivfParams(spark, dir)
    Shared.model(spark, dir, s"graft_ivfpq_codes_k${p.k}_r$LloydRounds",
      "cell", { (s, d) =>
        ivfIndexModel(s, d).select(col("cell"), col("neighbor_id"))
          .join(pqCodesModel(s, d), "neighbor_id")
      }, inputs = Seq("embeddings"))
  }

  def simIvfPqTopk(spark: SparkSession, dir: String): DataFrame = {
    val codes = ivfPqCodesModel(spark, dir)
    val qcells = ivfQueryCells(spark, dir, embNorm(spark, dir)
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("emb"), col("norm")))
      .select(col("query_id"), col("cell"))
    val qd = pqVsubs(spark, dir).filter(col("vec_id") < 10)
      .join(broadcast(pqCodebookModel(spark, dir)), "m")
      .select(col("vec_id").as("qid"), col("m"),
        col("code").as("qcode"), sdExpr)
    val perSub = (0 until 16).map(i =>
      sum(when(col("cm") === i, col("sd"))).as(s"s$i"))
    val byQuery = Window.partitionBy("query_id")
      .orderBy(col("approx_dist"), col("neighbor_id"))
    codes.join(broadcast(qcells), "cell")
      .join(broadcast(qd),
        col("query_id") === col("qid") && col("cm") === col("m") &&
          col("code") === col("qcode"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(perSub.head, perSub.tail: _*)
      .withColumn("approx_dist",
        (0 until 16).map(i => col(s"s$i")).reduce(_ + _))
      .withColumn("rank", row_number().over(byQuery).cast("long"))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id", "rank", "approx_dist")
      .orderBy("query_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_brute_topk" -> simBruteTopk _,
    "sim_lsh_topk" -> simLshTopk _,
    "sim_ivf_topk" -> simIvfTopk _,
    "sim_pq_topk" -> simPqTopk _,
    "sim_ivfpq_topk" -> simIvfPqTopk _)

  /** Shared DuckDB CTEs replaying the standing IVF index build (seed
    * sampling, quantized-sum Lloyd step, corpus cell assignment) — one
    * definition per engine, consumed by the sim_ivf oracle here and
    * the IVF-blocked embedding near-dup oracle in [[Dedup]]. */
  private[operators] lazy val sqlIvfCtes: String = {
    // one (membersN → sumsN → centsN) chain per Lloyd round — the
    // mechanical unroll of ivfRefinedCents' fixed-R loop; cents0 is
    // the seed set and the LAST round keeps the historical name
    // `cents` so every downstream oracle reads the refined centroids
    // unchanged
    val rounds = (1 to LloydRounds).map { i =>
      s"""members$i AS (
        SELECT cell, emb FROM (
          SELECT e.vec_id, e.emb, cell,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   list_cosine_similarity(emb, cent_emb) DESC, cell)
                   AS crank
          FROM e, cents${i - 1} WHERE e.vec_id >= 10
        ) WHERE crank = 1
      ),
      sums$i AS (
        SELECT cell, pos,
               sum(CAST(floor(emb[pos + 1] * 10000000.0) AS BIGINT)) AS cs
        FROM members$i, (SELECT unnest(range(0, 64)) AS pos) ps
        GROUP BY cell, pos
      ),
      ${if (i == LloydRounds) "cents" else s"cents$i"} AS (
        SELECT cell, list(CAST(cs AS DOUBLE) ORDER BY pos) AS cent_emb
        FROM sums$i GROUP BY cell
      ),"""
    }.mkString("\n      ")
    s"""WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
      ),
      -- scale-derived geometry, the SQL twin of Similarity.ivfParams:
      -- K = max(8, min(ceil(sqrt(N)), N div 32)) (min cell population
      -- 32), stride = max(1, N div K), nprobe = max(2, ceil(sqrt(K)))
      -- — all integer-deterministic
      ivf_geom AS (
        SELECT nc, greatest(8, least(
                 CAST(ceil(sqrt(CAST(nc AS DOUBLE))) AS BIGINT),
                 nc // 32)) AS k
        FROM (SELECT count(*) AS nc FROM e WHERE vec_id >= 10)
      ),
      ivf_params AS (
        SELECT nc, k, greatest(1, nc // k) AS stride,
               greatest(2,
                 CAST(ceil(sqrt(CAST(k AS DOUBLE))) AS BIGINT)) AS nprobe
        FROM ivf_geom
      ),
      seeds AS (
        SELECT cent_id, cent_emb FROM (
          SELECT e.vec_id AS cent_id, e.emb AS cent_emb, p.k,
                 row_number() OVER (ORDER BY e.vec_id) AS srank
          FROM e, ivf_params p
          WHERE e.vec_id >= 10 AND (e.vec_id - 10) % p.stride = 0
        ) WHERE srank <= k
      ),
      cents0 AS (
        SELECT cent_id AS cell, cent_emb FROM seeds
      ),
      $rounds
      scored AS (
        SELECT e.vec_id, e.emb, cell,
               list_cosine_similarity(emb, cent_emb) AS cos_c
        FROM e, cents
      ),
      assigned AS (
        SELECT *, row_number() OVER
          (PARTITION BY vec_id ORDER BY cos_c DESC, cell) AS crank
        FROM scored
      ),
      corpus AS (
        SELECT vec_id AS neighbor_id, emb AS c_emb, cell
        FROM assigned WHERE vec_id >= 10 AND crank = 1
      ),"""
  }

  val oracles: Map[String, String] = Map(
    "sim_brute_topk" -> """
      WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[]))
                 AS cosine
        FROM embeddings q JOIN embeddings c
          ON q.vec_id < 10 AND c.vec_id >= 10
      ),
      ranked AS (
        SELECT *, CAST(row_number() OVER
          (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)
          AS BIGINT) AS rank
        FROM scored
      )
      SELECT query_id, neighbor_id, rank, cosine FROM ranked
      WHERE rank <= 5 ORDER BY query_id, rank""",
    "sim_lsh_topk" -> {
      val bucketSql = (0 until 8).map { p =>
        val arr = planes(p).map(c => s"$c.0").mkString(", ")
        s"(CASE WHEN list_dot_product(emb, CAST([$arr] AS DOUBLE[])) " +
          s"> 0.0 THEN ${1 << p} ELSE 0 END)"
      }.mkString("\n               + ")
      s"""
      WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
      ),
      eb AS (
        SELECT vec_id, emb,
               CAST($bucketSql AS BIGINT) AS bucket
        FROM e
      ),
      q AS (SELECT vec_id AS query_id, emb AS q_emb,
                   CAST(xor(bucket, flip) AS BIGINT) AS bucket
            FROM eb,
                 (SELECT unnest([${Similarity.lshFlips.mkString(", ")}])
                    AS flip) fs
            WHERE vec_id < 10),
      c AS (SELECT vec_id AS neighbor_id, emb AS c_emb, bucket
            FROM eb WHERE vec_id >= 10),
      scored AS (
        SELECT query_id, neighbor_id,
               list_cosine_similarity(q_emb, c_emb) AS cosine
        FROM q JOIN c USING (bucket)
      ),
      ranked AS (
        SELECT *, CAST(row_number() OVER
          (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)
          AS BIGINT) AS rank
        FROM scored
      )
      SELECT query_id, neighbor_id, rank, cosine FROM ranked
      WHERE rank <= 5 ORDER BY query_id, rank"""
    },
    "sim_ivf_topk" -> s"""
      $sqlIvfCtes
      q AS (
        SELECT vec_id AS query_id, emb AS q_emb, cell
        FROM assigned, ivf_params WHERE vec_id < 10 AND crank <= nprobe
      ),
      sc AS (
        SELECT query_id, neighbor_id,
               list_cosine_similarity(q_emb, c_emb) AS cosine
        FROM corpus JOIN q USING (cell)
      ),
      ranked AS (
        SELECT *, CAST(row_number() OVER
          (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)
          AS BIGINT) AS rank
        FROM sc
      )
      SELECT query_id, neighbor_id, rank, cosine FROM ranked
      WHERE rank <= 5 ORDER BY query_id, rank""",
    "sim_pq_topk" -> s"""
      WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
      ),
      $sqlPqCtes,
      adc AS (
        SELECT query_id, neighbor_id,
               $sqlPqPerSub
        FROM pq_codes JOIN pq_qd ON cm = m AND code = qcode
        GROUP BY query_id, neighbor_id
      ),
      ranked AS (
        SELECT query_id, neighbor_id, $sqlPqAddSub AS approx_dist,
               CAST(row_number() OVER
                 (PARTITION BY query_id
                  ORDER BY $sqlPqAddSub, neighbor_id) AS BIGINT) AS rank
        FROM adc
      )
      SELECT query_id, neighbor_id, rank, approx_dist FROM ranked
      WHERE rank <= 5 ORDER BY query_id, rank""",
    "sim_ivfpq_topk" -> s"""
      $sqlIvfCtes
      $sqlPqCtes,
      qc AS (
        SELECT vec_id AS query_id, cell
        FROM assigned, ivf_params WHERE vec_id < 10 AND crank <= nprobe
      ),
      ccodes AS (
        SELECT c.cell, p.neighbor_id, p.cm, p.code
        FROM pq_codes p JOIN corpus c USING (neighbor_id)
      ),
      adc AS (
        SELECT qc.query_id AS query_id, k.neighbor_id,
               $sqlPqPerSub
        FROM ccodes k
        JOIN qc ON k.cell = qc.cell
        JOIN pq_qd d ON k.cm = d.m AND k.code = d.qcode
                    AND qc.query_id = d.query_id
        GROUP BY qc.query_id, k.neighbor_id
      ),
      ranked AS (
        SELECT query_id, neighbor_id, $sqlPqAddSub AS approx_dist,
               CAST(row_number() OVER
                 (PARTITION BY query_id
                  ORDER BY $sqlPqAddSub, neighbor_id) AS BIGINT) AS rank
        FROM adc
      )
      SELECT query_id, neighbor_id, rank, approx_dist FROM ranked
      WHERE rank <= 5 ORDER BY query_id, rank""")

  /** CASE-pivot of the 16 per-subspace ADC terms (fixed add order —
    * a grouped double sum would be partition-order-dependent). */
  private lazy val sqlPqPerSub: String = (0 until 16)
    .map(i => s"sum(CASE WHEN cm = $i THEN sd END) AS s$i")
    .mkString(",\n               ")
  private lazy val sqlPqAddSub: String =
    (0 until 16).map(i => s"s$i").mkString(" + ")

  /** Shared DuckDB CTEs replaying the PQ pipeline — codebook seed
    * sampling, one quantized-sum Lloyd step, corpus encoding
    * (`pq_codes`), per-query sub-distances (`pq_qd`) — consumed by the
    * sim_pq and sim_ivfpq oracles. Expects an upstream CTE
    * `e(vec_id, emb)`; CTE names are pq_-prefixed because
    * [[sqlIvfCtes]] (which sim_ivfpq composes with) already defines
    * `seeds`/`scored`/`assigned`.
    */
  private lazy val sqlPqCtes: String = """
      pq_seeds AS (
        SELECT vec_id AS cent_id, emb AS cent_emb FROM e
        WHERE vec_id >= 10 AND vec_id % 59 = 0
        ORDER BY vec_id LIMIT 16
      ),
      pq_sub0 AS (
        SELECT vec_id, cent_id, m,
               list_dot_product(vs, vs) + list_dot_product(cs, cs)
                 - 2.0 * list_dot_product(vs, cs) AS sd
        FROM (
          SELECT e.vec_id, cent_id, m,
                 e.emb[m * 4 + 1 : m * 4 + 4] AS vs,
                 cent_emb[m * 4 + 1 : m * 4 + 4] AS cs
          FROM e, pq_seeds, (SELECT unnest(range(0, 16)) AS m) ms
          WHERE e.vec_id >= 10 AND e.vec_id % 3 = 0
        )
      ),
      pq_codes0 AS (
        SELECT vec_id, m, cent_id AS code
        FROM (
          SELECT *, row_number() OVER
            (PARTITION BY vec_id, m ORDER BY sd, cent_id) AS crank
          FROM pq_sub0
        ) WHERE crank = 1
      ),
      pq_tsums AS (
        SELECT m, code, pos,
               sum(CAST(floor(emb[m * 4 + pos + 1] * 10000000.0)
                 AS BIGINT)) AS s,
               count(*) AS n
        FROM pq_codes0 JOIN e USING (vec_id),
             (SELECT unnest(range(0, 4)) AS pos) ps
        GROUP BY m, code, pos
      ),
      pq_trained AS (
        SELECT m, code,
               list(CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                 + 0.5) AS DOUBLE) / 10000000.0 ORDER BY pos)
                 AS cent_emb
        FROM pq_tsums GROUP BY m, code
      ),
      pq_sub AS (
        SELECT vec_id, code, m,
               list_dot_product(vs, vs) + list_dot_product(cs, cs)
                 - 2.0 * list_dot_product(vs, cs) AS sd
        FROM (
          SELECT e.vec_id, code, m,
                 e.emb[m * 4 + 1 : m * 4 + 4] AS vs,
                 cent_emb AS cs
          FROM e, pq_trained
        )
      ),
      pq_codes AS (
        SELECT vec_id AS neighbor_id, m AS cm, code
        FROM (
          SELECT *, row_number() OVER
            (PARTITION BY vec_id, m ORDER BY sd, code) AS crank
          FROM pq_sub WHERE vec_id >= 10
        ) WHERE crank = 1
      ),
      pq_qd AS (
        SELECT vec_id AS query_id, m, code AS qcode, sd
        FROM pq_sub WHERE vec_id < 10
      )"""
}
