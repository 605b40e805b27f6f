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
    * (sequential-fold dot product).
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
        expr("graft_dot_product(q_emb, c_emb)") /
          (col("q_norm") * col("c_norm")))
      .withColumn("rank", row_number().over(byQuery).cast("long"))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id", "rank", "cosine")
      .orderBy("query_id", "rank")
  }

  /** E6b — LSH-bucketed ANN: 8 deterministic random-hyperplane bits per
    * vector (plane signs from xxhash64), candidates share the full
    * 8-bit bucket, then exact cosine re-ranking within the bucket.
    * Rows-only check (hash planes aren't SQL-portable); recall is
    * eyeballed against sim_brute_topk. Bucket bits come from a fixed
    * per-row accumulation order (LshBucket), so they are stable across
    * runs and shuffle orders.
    */
  def simLshTopk(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val e = t(spark, dir, "embeddings")
    // one linear pass per vector: 8 hyperplane sign bits via the custom
    // LshBucket expression (replaces posexplode(dims) × explode(planes)
    // + two aggregations)
    val e2 = e
      .withColumn("bucket", expr("graft_lsh_bucket(embedding)"))
      .withColumn("norm",
        sqrt(expr("graft_dot_product(embedding, embedding)")))
    val queries = e2.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("norm").as("q_norm"), col("bucket"))
    val candidates = e2.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("neighbor_id"),
        col("embedding").as("c_emb"), col("norm").as("c_norm"),
        col("bucket"))
    val byQuery = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    candidates.join(broadcast(queries), Seq("bucket"))
      .withColumn("cosine",
        expr("graft_dot_product(q_emb, c_emb)") /
          (col("q_norm") * col("c_norm")))
      .withColumn("rank", row_number().over(byQuery).cast("long"))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id", "rank", "cosine")
      .orderBy("query_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_brute_topk" -> simBruteTopk _,
    "sim_lsh_topk" -> simLshTopk _)

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
      WHERE rank <= 5 ORDER BY query_id, rank""")
}
