package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Process-wide shared materializations built through the A-layer —
  * the "dbt `table` model feeding many downstreams" pattern: a
  * deterministic intermediate is written ONCE per (process, sf dir) as
  * a bucketed model via [[graft.api.FalApi.writeToModel]] into a
  * scratch registry, and every consumer `ref()`s it, reading
  * pre-clustered parquet whose bucket spec rides the catalog table (no
  * exchange on the bucketed key downstream). This is how the query
  * layer leans on the data-movement layer instead of each query
  * rebuilding the same upstream cold.
  */
private[graft] object Shared {
  import graft.api.{FalApi, ModelDef, ModelKind, Registry, RunLedger}

  private val built = scala.collection.concurrent
    .TrieMap.empty[(String, String), Registry]

  /** Schema-only mode (VERDICT r9 #9): when the session conf
    * `graft.schemaOnly` is true, query CONSTRUCTION must not run Spark
    * jobs — the three eager choke points ([[model]] first-touch builds,
    * `Dedup.connectedComponents`' contraction loop,
    * `Similarity.ivfParams`' corpus count) return lazy/fixed
    * schema-identical substitutes instead. Used by GateSchemaSpec to
    * walk all query output schemas in O(seconds); never set it when the
    * query's ROWS matter. Schema parity between the two modes is pinned
    * by the spec's own parity tests.
    */
  def schemaOnly(spark: SparkSession): Boolean =
    spark.conf.getOption("graft.schemaOnly").exists(_.toBoolean)

  /** Wall-clock build cost of each standing model's first-touch
    * materialization this process, keyed by model name — the amortized
    * cost the per-query bench numbers exclude. [[graft.Bench]] surfaces
    * it as the `standing_models` block of bench_detail.json so the
    * build-once price is recorded next to the per-query price it buys
    * down.
    */
  val buildSeconds = scala.collection.concurrent
    .TrieMap.empty[String, Double]

  /** `ref()` of the shared model `name` over `dir`, building it
    * bucketed on `bucketBy` on first touch.
    */
  def model(spark: SparkSession, dir: String, name: String,
      bucketBy: String,
      build: (SparkSession, String) => DataFrame,
      extraMeta: Map[String, String] = Map.empty): DataFrame = {
    // schema-only walks read an already-built model if one exists (a
    // lazy parquet scan) but never trigger a first-touch build
    if (schemaOnly(spark) && !built.contains((dir, name)))
      return build(spark, dir)
    val registry = built.getOrElseUpdate((dir, name), {
      val t0 = System.nanoTime()
      val reg = new Registry(java.nio.file.Files
        .createTempDirectory(s"graft_shared_$name").toString)
      val buckets =
        spark.conf.get("spark.sql.shuffle.partitions", "32")
      reg.register(ModelDef(name,
        ModelKind.Scala((s, _) => build(s, dir)),
        meta = Map("bucket_by" -> bucketBy, "buckets" -> buckets)
          ++ extraMeta))
      new FalApi(spark, reg, new RunLedger)
        .writeToModel(build(spark, dir), name)
      buildSeconds.put(name, (System.nanoTime() - t0) / 1e9)
      reg
    })
    new FalApi(spark, registry, new RunLedger).ref(name)
  }
}
