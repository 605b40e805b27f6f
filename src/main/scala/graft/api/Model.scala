package graft.api

/** Core data model of the orchestration layer (SURVEY.md §1).
  *
  * Mirrors the reference's node taxonomy — `DbtModel`
  * (`/root/reference/projects/adapter/src/fal/dbt/integration/project.py:214-314`),
  * `DbtSource` (`project.py:192-210`), `DbtTest` (`project.py:94-172`) —
  * trimmed to what a Spark-native engine needs: dbt's manifest becomes
  * this registry's definitions, and a "relation" becomes a parquet
  * directory behind a versioned pointer.
  */

/** What produces a model's data (ref: `FalFlowNode` subtypes,
  * `A/fal/dbt/node_graph.py:21-35`).
  */
sealed trait ModelKind
object ModelKind {
  /** A SQL-text model run through `spark.sql` after ref substitution. */
  final case class Sql(sql: String) extends ModelKind
  /** A Scala model function — the rebuild's `def model(dbt, fal)`
    * (ref: D1, `A/dbt/include/fal/macros/materializations/table.sql:34-46`).
    */
  final case class Scala(
      fn: (org.apache.spark.sql.SparkSession, FalApi) =>
        org.apache.spark.sql.DataFrame)
      extends ModelKind
  /** A reference-style Python model — a `.py` file defining
    * `def model(dbt, fal)` over pandas, executed in its own interpreter
    * process with parquet handoff (ref: the flagship materialization,
    * `A/dbt/include/fal/macros/materializations/table.sql:34-46` +
    * `A/dbt/adapters/fal_experimental/impl.py:65-137`). `deps` on the
    * ModelDef declare which `ref()`s the file reads, as the reference
    * extracts from the source text. `environment` is the model's
    * declared requirement set (ref: `fal_environment` in
    * `A/fal/cli_tests/projects/env_project/models/model_c.py:1-12`,
    * resolved by `fal/packages/environments/base.py:43-101`): non-empty
    * → the model runs in a cached venv keyed by the requirements hash
    * ([[PyBridge.pythonFor]]). A leading `conda` element selects the
    * reference's conda flavor (`environments/conda.py:33-90`): the
    * remaining entries are conda packages, resolved through the same
    * get-or-create cache.
    */
  final case class Python(pyFile: String,
      environment: Seq[String] = Nil) extends ModelKind
  /** A dbt seed — a checked-in CSV loaded as a relation (the reference's
    * jaffle project boots from three of these: `002_jaffle_shop/
    * dbt_project.yml:6` `seed-paths: ["data"]` + `data/raw_*.csv`).
    */
  final case class Seed(csvPath: String) extends ModelKind
}

/** A named transformation producing one relation (ref: `DbtModel`).
  * `meta` carries free-form config like the reference's `meta.fal`.
  */
final case class ModelDef(
    name: String,
    kind: ModelKind,
    deps: Seq[String] = Seq.empty,
    tags: Set[String] = Set.empty,
    incremental: Boolean = false,
    meta: Map[String, String] = Map.empty)

/** A declared external input (ref: `DbtSource`): a data path plus an
  * optional loaded-at column for freshness (B13).
  *
  * `format`/`options` replace the reference's per-warehouse fast-scan
  * matrix (SURVEY.md §2a A3: seven backend-specific readers) with the
  * one Spark DataSource surface — parquet is the native storage,
  * csv/json cover file feeds, and `jdbc` (with url/dbtable options)
  * covers external databases.
  */
/** A declared external input. `options` passes straight to the
  * DataSource reader, so an external-DB source parallelizes with the
  * standard bounded-read keys (`partitionColumn` / `lowerBound` /
  * `upperBound` / `numPartitions` → one JDBC cursor per stride) — the
  * reference's per-warehouse bulk readers (`lib.py:539-558`) collapsed
  * onto Spark's own partitioned JDBC scan (SourceFormatSpec proves the
  * multi-partition read).
  */
final case class SourceDef(
    sourceName: String,
    tableName: String,
    path: String,
    loadedAtField: Option[String] = None,
    format: String = "parquet",
    options: Map[String, String] = Map.empty)

/** Run statuses, matching the reference's task states
  * (`A/fal/dbt/planner/tasks.py:48-53`) plus "tested"
  * (`project.py:176-188`).
  */
object Status {
  val Pending = "pending"
  val Success = "success"
  val Failure = "failure"
  val Skipped = "skipped"
  val Tested = "tested"
}

/** Per-write adapter response (ref: `AdapterResponse.rows_affected`
  * surfaced through `write_to_model`, `project.py:757-801`).
  */
final case class WriteResult(relation: String, rowsAffected: Long,
    mode: String)
