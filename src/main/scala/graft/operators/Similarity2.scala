package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 embedding-space operator: one full Lloyd iteration of
  * k-means (E-step assignment + M-step centroid recompute) — the
  * clustering primitive behind semantic dedup, IVF index training and
  * topic bucketing. [[Similarity]]'s IVF/PQ queries *consume* sampled
  * centroids; this operator is the step that would refine them.
  *
  * Oracle-checked exactly: distances are sequential-fold dot products
  * (bitwise equal to DuckDB's list_dot_product), the argmin tie-breaks
  * on centroid id, and the per-dimension means go through
  * round-then-decimal sums so reduction order cannot matter.
  */
object Similarity2 extends QueryPack {

  /** E6 (extension) — one k-means Lloyd iteration over the embeddings:
    * assign every vector to its nearest (squared-L2, via the
    * ‖v‖²+‖c‖²−2v·c identity — keeps every term inside whole-stage
    * codegen, see simPqTopk's note) of the 8 deterministically sampled
    * seed centroids, then recompute each cluster's centroid as the
    * per-dimension mean. The first 8 dimensions are emitted.
    *
    * Scale: assignment is a broadcast nested loop (K·N dot products,
    * map-only over the corpus); the M-step is one hash aggregation on
    * (cluster, dim) with map-side combine — at 100 TB this is exactly
    * the distributed k-means iteration (the corpus never moves; only
    * K·dim partial sums shuffle).
    */
  def simKmeansStep(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val e = t(spark, dir, "embeddings")
      .select(col("vec_id"), expr("CAST(embedding AS ARRAY<DOUBLE>)").as("emb"))
    val cents = e.filter(col("vec_id") >= 10 && col("vec_id") % 59 === 0)
      .orderBy("vec_id").limit(8)
      .select(col("vec_id").as("cent_id"), col("emb").as("cent_emb"))
    val byVec = Window.partitionBy("vec_id")
      .orderBy(col("d2").asc, col("cent_id"))
    val assigned = e.join(broadcast(cents))
      .withColumn("d2",
        expr("graft_dot_product(emb, emb) + " +
          "graft_dot_product(cent_emb, cent_emb) - " +
          "2.0D * graft_dot_product(emb, cent_emb)"))
      .withColumn("crank", row_number().over(byVec))
      .filter(col("crank") === 1)
      .select(col("cent_id").as("cluster"), col("emb"))
    assigned
      .select(col("cluster"),
        explode(sequence(lit(0), lit(7))).as("dim"), col("emb"))
      .select(col("cluster"), col("dim").cast("long").as("dim"),
        element_at(col("emb"), col("dim") + 1).as("v"))
      .groupBy("cluster", "dim")
      .agg(count(lit(1)).as("n"),
        (lsum(col("v")) / count(lit(1)).cast("double")).as("mean_v"))
      .select(col("cluster"), col("dim"), col("n"),
        round(col("mean_v"), 6).as("new_centroid"))
      .orderBy("cluster", "dim")
  }

  /** E6e — int8 embedding quantization, the STORAGE path of a 100 TB
    * embedding pipeline (raw float32 × 64 dims = 256 B/vector; symmetric
    * absmax-scaled int8 codes are 64 B + one float scale — the standard
    * 4× shrink every large vector store applies before indexing): per
    * vector, scale = 127/max|x|, codes = round(x·scale), plus the
    * reconstruction squared error as the quality readout. One
    * codegen'd/HOF map pass, no shuffle beyond the output sort; pairs
    * with the PQ path ([[Similarity.simPqTopk]]) as the two standard
    * compression tiers.
    *
    * Fully oracle-checked bitwise: absmax is an exact fold, the scale
    * is one division, each code is floor(x·scale + 0.5) (exact in both
    * engines, half-up for negatives too), and the error is a
    * sequential-fold dot product of exact elementwise differences —
    * every operand computes to identical bits in DuckDB.
    */
  def simInt8Quantize(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    t(spark, dir, "embeddings")
      .select(col("vec_id"),
        expr("CAST(embedding AS ARRAY<DOUBLE>)").as("emb"))
      .withColumn("amax", expr(
        "aggregate(emb, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(x)))"))
      .filter(col("amax") > 0.0)
      .withColumn("scale", lit(127.0) / col("amax"))
      .withColumn("codes", expr(
        "transform(emb, x -> CAST(floor(x * scale + 0.5D) AS INT))"))
      .withColumn("diff", expr(
        "zip_with(emb, codes, (x, c) -> x - CAST(c AS DOUBLE) / scale)"))
      .select(col("vec_id"), col("scale"),
        // Arrays are serialized for the export — the driver's pandas
        // comparator cannot sort raw array columns (same lesson as
        // c18_arrays, see Relational2's array_join note). The list form
        // stays internal; only the string crosses the gate.
        array_join(col("codes"), "|").as("codes"),
        expr("graft_dot_product(diff, diff)").as("recon_err"))
      .orderBy("vec_id")
  }

  /** 8 JL projection rows × 64 dims of integer-valued coefficients in
    * [-500, 500] — same xorshift construction as [[Similarity.planes]]
    * (integer-valued doubles are exactly representable, and the
    * literals are interpolated into both engines' SQL), different seed
    * so the projection is independent of the LSH buckets. */
  private[operators] val jlRows: IndexedSeq[IndexedSeq[Int]] = {
    var x = 0x13198a2e03707344L // seed ≠ Similarity.planes'
    def next(): Long = { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; x }
    IndexedSeq.fill(8, 64)((math.floorMod(next(), 1001L) - 500L).toInt)
  }

  /** Per-coefficient variance of the uniform integer draw in
    * [-500, 500]: (1001² − 1)/12 — the JL normalizer making
    * E[‖y‖²/(k·Var)] = ‖x‖². Exact-rational literal, identical in
    * both engines. */
  private[operators] val jlVar: Double = (1001.0 * 1001.0 - 1.0) / 12.0

  /** E6 (extension) — Johnson–Lindenstrauss random projection: the
    * dimensionality-reduction stage of an embedding pipeline (compress
    * 64 → 8 dims with a fixed random matrix before indexing/transport;
    * at 100 TB the projected table is the thing you ship, 8× smaller).
    * Emits per vector the first 4 projected coordinates and the JL
    * norm ratio ‖y‖/(√(k·Var)·‖x‖) — the distortion readout that
    * should concentrate near 1 (pinned in expectation by
    * ApproxQualitySpec; per-vector spread at k=8 is wide by design).
    *
    * Fully oracle-checked bitwise: each coordinate is a
    * sequential-fold dot product against integer-valued literals
    * shared with the generated DuckDB SQL, the squared norm adds the 8
    * coordinates in a fixed written order (never a grouped sum), and
    * the ratio is two sqrts and one division — all portable.
    *
    * Scale: one codegen'd map pass over the corpus, no shuffle beyond
    * the output sort; the matrix is a literal, so nothing broadcasts.
    */
  def simRandProjection(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val e = t(spark, dir, "embeddings")
      .select(col("vec_id"),
        expr("CAST(embedding AS ARRAY<DOUBLE>)").as("emb"))
    val withY = (0 until 8).foldLeft(e) { (df, p) =>
      val arr = jlRows(p).map(c => s"${c}.0D").mkString(",")
      df.withColumn(s"y$p",
        expr(s"graft_dot_product(emb, array($arr))"))
    }
    val sumSq = (0 until 8).map(p => s"y$p * y$p").mkString(" + ")
    withY
      .filter(expr("graft_dot_product(emb, emb)") > 0.0)
      .withColumn("norm_ratio",
        expr(s"sqrt($sumSq) / (sqrt(8.0D * $jlVar) * " +
          "sqrt(graft_dot_product(emb, emb)))"))
      .select(col("vec_id"), col("y0"), col("y1"), col("y2"), col("y3"),
        col("norm_ratio"))
      .orderBy("vec_id")
  }

  /** Hard negatives must be confusable but must NOT be near-duplicates:
    * a clone of the anchor scored as a "negative" teaches the model to
    * push apart identical content (a false negative), and a random
    * low-similarity document teaches nothing. The band is the contract. */
  private[operators] val HardNegLo = 0.25
  private[operators] val HardNegHi = 0.95

  /** E6 (extension) — hard-negative mining for contrastive training:
    * for each anchor (vec_id < 10), the top-5 corpus candidates whose
    * cosine lies in [[HardNegLo]] ≤ cos < [[HardNegHi]] — similar
    * enough to be confusable, strictly below the near-duplicate cutoff
    * (the same 0.95 the incremental dup probe uses, so a mined
    * negative can never be a dup the dedup pass would remove). Probes
    * the STANDING IVF index ([[Similarity.ivfIndexModel]]): candidate
    * generation touches only the anchor's nprobe nearest cells, then
    * the band filter and re-rank run on the probed rows.
    *
    * Non-vacuous at both gate scales: at sf0.01 the lower bound cuts
    * sub-0.25 tails out of some anchors' unbanded top-5; at sf1 the
    * planted clone clusters land at cosine ≈ 1.0 and the upper bound
    * excludes them (HardNegSpec pins both directions on the fixture).
    *
    * Scale: identical shape to [[Similarity.ivfProbe]] — the corpus
    * never moves (pre-bucketed standing index), queries broadcast, the
    * band filter is a codegen'd predicate on the probed rows, and the
    * per-anchor top-5 is a bounded window over candidate rows only.
    * Fully oracle-checked: cosines are bitwise-portable quotients, so
    * the band comparisons decide identically in both engines even at
    * the boundaries.
    */
  def simHardNegatives(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val queries = t(spark, dir, "embeddings")
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"),
        expr("CAST(embedding AS ARRAY<DOUBLE>)").as("emb"))
      .withColumn("norm", sqrt(expr("graft_dot_product(emb, emb)")))
    val queryCells = Similarity.ivfQueryCells(spark, dir, queries)
    val byQuery = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    Similarity.ivfIndexModel(spark, dir)
      .join(broadcast(queryCells), Seq("cell"))
      .withColumn("cosine",
        clampCos(expr("graft_dot_product(q_emb, c_emb)") /
          (col("q_norm") * col("c_norm"))))
      .filter(col("cosine") >= lit(HardNegLo) &&
        col("cosine") < lit(HardNegHi))
      .withColumn("rank", row_number().over(byQuery).cast("long"))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id", "rank", "cosine")
      .orderBy("query_id", "rank")
  }

  /** E6 (completion) — the corpus-wide k-NN GRAPH, blocked on the
    * fixed-population LSH band table ([[Dedup2.lshBandModel]]): for
    * every corpus member, its 3 nearest band-mates by cosine. This is
    * the graph artifact semantic curation consumes — SemDeDup prunes
    * it (Abbas et al. 2023 compute pairwise similarity within blocked
    * clusters, exactly this shape), graph-based quality propagation
    * walks it, and cluster-balanced sampling reads its degree
    * structure.
    *
    * PAIR-LINEAR by construction (VERDICT r13 #3 — the earlier
    * within-IVF-cell blocking inherited the K=√N cell geometry and
    * measured Θ(N^1.5) candidate work, sf10 slope 1.13): candidates
    * per vector are bounded by BAND population, which the count-derived
    * band width pins to (16, 32] per band regardless of corpus size
    * ([[Dedup2.neardupBits]]) — total candidate volume is ≤ ~3·32·N at
    * every scale. Recall trade vs the cell blocking is measured in
    * ApproxQualitySpec's rank-1 brute-force agreement gate.
    *
    * Fully oracle-checked: DuckDB replays the band table
    * ([[Dedup2.sqlBandCtes]]), the band-blocked pair join with the
    * cross-band max-collapse, and the per-vector ranking (cosine desc,
    * neighbor_id tiebreak — the clampCos/list_cosine_similarity
    * bitwise pairing every sim_* oracle rides).
    *
    * Scale: the self-join runs on the bk-BUCKETED standing band table
    * (bucket-local, no exchange on either side); a pair colliding in
    * several bands collapses through a partial-aggregating hash agg on
    * the (vec, neighbor) key BEFORE ranking (cosine is band-invariant,
    * so max = the value); the rank-≤3 filter compiles to
    * WindowGroupLimit, so each task keeps a 3-row heap per vector and
    * only N×3 candidate rows reach the vec_id exchange.
    */
  def simKnnGraph(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // k-NN width: same (16, 32] population target, floor 2 — at the
    // toy SFs the near-dup floor of 8 starves candidates (pop ~2);
    // for nc ≥ ~8k both widths coincide and this IS the near-dup table
    val idx = Dedup2.lshBandModelAt(spark, dir,
      Dedup2.knnBits(Similarity.ivfParams(spark, dir).nc))
    val a = idx.select(col("bk"), col("vec_id"),
      col("c_emb").as("ea"), col("c_norm").as("na"))
    val b = idx.select(col("bk"), col("vec_id").as("neighbor_id"),
      col("c_emb").as("eb"), col("c_norm").as("nb"))
    val byVec = Window.partitionBy("vec_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    a.join(b, Seq("bk"))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        clampCos(expr("graft_dot_product(ea, eb)") /
          (col("na") * col("nb"))))
      .groupBy("vec_id", "neighbor_id")
      .agg(max(col("cosine")).as("cosine"))
      .withColumn("rank", row_number().over(byVec).cast("long"))
      .filter(col("rank") <= 3)
      .select("vec_id", "neighbor_id", "rank", "cosine")
      .orderBy("vec_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_knn_graph" -> simKnnGraph _,
    "sim_kmeans_step" -> simKmeansStep _,
    "sim_int8_quantize" -> simInt8Quantize _,
    "sim_hard_negatives" -> simHardNegatives _,
    "sim_rand_projection" -> simRandProjection _)

  val oracles: Map[String, String] = Map(
    "sim_knn_graph" -> s"""
      WITH ${Dedup2.sqlBandCtesFloor(2)},
      pairs AS (
        SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
               max(list_cosine_similarity(a.emb, b.emb)) AS cosine
        FROM bands a JOIN bands b USING (bk)
        WHERE a.vec_id != b.vec_id
        GROUP BY 1, 2
      ),
      ranked AS (
        SELECT *, CAST(row_number() OVER
          (PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id)
          AS BIGINT) AS rank
        FROM pairs
      )
      SELECT vec_id, neighbor_id, rank, cosine FROM ranked
      WHERE rank <= 3 ORDER BY vec_id, rank""",
    "sim_rand_projection" -> {
      val ys = (0 until 8).map { p =>
        val arr = jlRows(p).map(c => s"$c.0").mkString(", ")
        s"list_dot_product(emb, CAST([$arr] AS DOUBLE[])) AS y$p"
      }.mkString(",\n               ")
      val sumSq = (0 until 8).map(p => s"y$p * y$p").mkString(" + ")
      s"""
      WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
        WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[])) > 0.0
      ),
      proj AS (
        SELECT vec_id,
               $ys,
               list_dot_product(emb, emb) AS xx
        FROM e
      )
      SELECT vec_id, y0, y1, y2, y3,
             sqrt($sumSq) / (sqrt(8.0 * $jlVar) * sqrt(xx)) AS norm_ratio
      FROM proj ORDER BY vec_id"""
    },
    "sim_hard_negatives" -> s"""
      ${Similarity.sqlIvfCtes}
      q AS (
        SELECT vec_id AS query_id, emb AS q_emb, cell
        FROM assigned, ivf_params WHERE vec_id < 10 AND crank <= nprobe
      ),
      sc AS (
        SELECT query_id, neighbor_id,
               list_cosine_similarity(q_emb, c_emb) AS cosine
        FROM corpus JOIN q USING (cell)
      ),
      banded AS (
        SELECT * FROM sc
        WHERE cosine >= $HardNegLo AND cosine < $HardNegHi
      ),
      ranked AS (
        SELECT *, CAST(row_number() OVER
          (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)
          AS BIGINT) AS rank
        FROM banded
      )
      SELECT query_id, neighbor_id, rank, cosine FROM ranked
      WHERE rank <= 5 ORDER BY query_id, rank""",
    "sim_int8_quantize" -> """
      WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
      ),
      s AS (
        SELECT vec_id, emb,
               127.0 / list_aggregate(list_transform(emb,
                 x -> abs(x)), 'max') AS scale
        FROM e
        WHERE list_aggregate(list_transform(emb, x -> abs(x)), 'max')
              > 0.0
      ),
      q AS (
        SELECT vec_id, scale,
               list_transform(emb,
                 x -> CAST(floor(x * scale + 0.5) AS INTEGER)) AS codes,
               emb
        FROM s
      ),
      d AS (
        SELECT vec_id, scale, codes,
               list_transform(range(1, len(emb) + 1),
                 i -> emb[i] - CAST(codes[i] AS DOUBLE) / scale) AS diff
        FROM q
      )
      SELECT vec_id, scale,
             array_to_string(codes, '|') AS codes,
             list_dot_product(diff, diff) AS recon_err
      FROM d ORDER BY vec_id""",
    "sim_kmeans_step" -> s"""
      WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
      ),
      cents AS (
        SELECT vec_id AS cent_id, emb AS cent_emb FROM e
        WHERE vec_id >= 10 AND vec_id % 59 = 0
        ORDER BY vec_id LIMIT 8
      ),
      scored AS (
        SELECT e.vec_id, e.emb, cent_id,
               list_dot_product(emb, emb) +
                 list_dot_product(cent_emb, cent_emb) -
                 2.0 * list_dot_product(emb, cent_emb) AS d2
        FROM e, cents
      ),
      assigned AS (
        SELECT cent_id AS cluster, emb FROM (
          SELECT *, row_number() OVER
            (PARTITION BY vec_id ORDER BY d2 ASC, cent_id) AS crank
          FROM scored
        ) WHERE crank = 1
      ),
      dims AS (
        SELECT cluster, CAST(dim AS BIGINT) AS dim, emb[dim + 1] AS v
        FROM assigned, unnest(range(0, 8)) AS t(dim)
      )
      SELECT cluster, dim, count(*) AS n,
             round(${sqlLsum("v")} / CAST(count(*) AS DOUBLE), 6)
               AS new_centroid
      FROM dims GROUP BY cluster, dim ORDER BY cluster, dim""")
}
