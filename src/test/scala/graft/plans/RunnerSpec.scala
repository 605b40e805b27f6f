package graft.plans

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.api._

/** End-to-end Runner behaviors: meta-driven incremental strategies and
  * test-status propagation (ref: simple_project incremental chain +
  * `project.py:176-188` tested-status rules).
  */
class RunnerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshApi(): FalApi = {
    val root = Files.createTempDirectory("graft-runner").toString
    new FalApi(spark, new Registry(root), new RunLedger)
  }

  test("incremental merge strategy upserts on re-run") {
    val api = freshApi()
    import spark.implicits._
    val src = Files.createTempDirectory("graft-src-inc")
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .write.mode("overwrite").parquet(src.resolve("t").toString)
    api.registry.register(SourceDef("ext", "t", src.resolve("t").toString))
    api.registry.register(ModelDef("inc_model",
      ModelKind.Sql("SELECT * FROM {{ source('ext', 't') }}"),
      incremental = true,
      meta = Map("incremental_strategy" -> "merge", "unique_key" -> "id")))

    assert(Runner.run(api, Runner.RunConfig()) == 0)
    assert(api.ref("inc_model").count() == 2)

    // source evolves: id=2 updated, id=3 new
    Seq((2L, 21.0), (3L, 30.0)).toDF("id", "v")
      .write.mode("overwrite").parquet(src.resolve("t").toString)
    assert(Runner.run(api, Runner.RunConfig()) == 0)
    val out = api.ref("inc_model").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq == Seq((1L, 10.0), (2L, 21.0), (3L, 30.0)))
  }

  test("snapshot materialization refreshes SCD2 history on re-run") {
    val api = freshApi()
    import spark.implicits._
    val src = Files.createTempDirectory("graft-src-snap")
    Seq((1L, "open"), (2L, "open")).toDF("id", "status")
      .write.mode("overwrite").parquet(src.resolve("t").toString)
    api.registry.register(SourceDef("ext", "t", src.resolve("t").toString))
    api.registry.register(ModelDef("snap_model",
      ModelKind.Sql("SELECT * FROM {{ source('ext', 't') }}"),
      meta = Map("materialized" -> "snapshot", "unique_key" -> "id",
        "check_cols" -> "status", "snapshot_at" -> "2024-01-01 00:00:00")))
    assert(Runner.run(api, Runner.RunConfig()) == 0)
    assert(api.ref("snap_model").count() == 2)

    Seq((1L, "closed"), (2L, "open")).toDF("id", "status")
      .write.mode("overwrite").parquet(src.resolve("t").toString)
    api.registry.register(ModelDef("snap_model",
      ModelKind.Sql("SELECT * FROM {{ source('ext', 't') }}"),
      meta = Map("materialized" -> "snapshot", "unique_key" -> "id",
        "check_cols" -> "status", "snapshot_at" -> "2024-02-01 00:00:00")))
    assert(Runner.run(api, Runner.RunConfig()) == 0)
    val hist = api.ref("snap_model").orderBy("id", "dbt_valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getAs[java.sql.Timestamp]("dbt_valid_to") == null))
    assert(hist.toSeq == Seq((1L, "open", false), (1L, "closed", true),
      (2L, "open", true)))
  }

  test("passing tests promote status to tested") {
    val api = freshApi()
    import spark.implicits._
    val src = Files.createTempDirectory("graft-src-ok")
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.mode("overwrite").parquet(src.resolve("t").toString)
    api.registry.register(SourceDef("ext", "t", src.resolve("t").toString))
    api.registry.register(ModelDef("tested_model",
      ModelKind.Sql("SELECT * FROM {{ source('ext', 't') }}")))
    api.registry.registerTest(Tests.notNull("tested_model", "id"))
    api.registry.registerTest(Tests.unique("tested_model", "id"))

    assert(Runner.run(api, Runner.RunConfig()) == 0)
    assert(api.registry.status("tested_model") == Status.Tested)
    assert(api.ledger.all.exists(r =>
      r.node == "not_null_tested_model_id" && r.status == Status.Success))
  }

  test("failing test fails the node and skips dependents") {
    val api = freshApi()
    import spark.implicits._
    val src = Files.createTempDirectory("graft-src-bad")
    Seq((1L, "a"), (1L, "b")).toDF("id", "s") // duplicate id
      .write.mode("overwrite").parquet(src.resolve("t").toString)
    api.registry.register(SourceDef("ext", "t", src.resolve("t").toString))
    api.registry.register(ModelDef("bad_model",
      ModelKind.Sql("SELECT * FROM {{ source('ext', 't') }}")))
    api.registry.register(ModelDef("downstream",
      ModelKind.Sql("SELECT count(*) AS n FROM {{ ref('bad_model') }}"),
      deps = Seq("bad_model")))
    api.registry.registerTest(Tests.unique("bad_model", "id"))

    assert(Runner.run(api, Runner.RunConfig()) == 1)
    assert(api.ledger.all.exists(r =>
      r.node == "unique_bad_model_id" && r.status == Status.Failure))
    assert(!api.registry.relationExists("downstream"))
  }

  /** VERDICT r8 #4: `accepted_values` — the jaffle fixture's third
    * generic test (ref `002_jaffle_shop/models/schema.yml:75`). NULL
    * passes (dbt's `not in` is three-valued), off-list values fail.
    */
  test("accepted_values promotes on clean data and fails on off-list") {
    val api = freshApi()
    import spark.implicits._
    api.writeToModel(
      Seq((1L, Some("placed")), (2L, Some("shipped")), (3L, None))
        .toDF("id", "status"), "orders_ok")
    val ok = Tests.acceptedValues("orders_ok", "status",
      Seq("placed", "shipped", "completed"))
    assert(ok.name == "accepted_values_orders_ok_status")
    assert(ok.violations(api) == 0) // NULL row is not a violation

    val src = Files.createTempDirectory("graft-src-av")
    Seq((1L, "placed"), (2L, "bogus"), (3L, "shipped"))
      .toDF("id", "status")
      .write.mode("overwrite").parquet(src.resolve("t").toString)
    api.registry.register(SourceDef("ext", "t", src.resolve("t").toString))
    api.registry.register(ModelDef("orders_bad",
      ModelKind.Sql("SELECT * FROM {{ source('ext', 't') }}")))
    api.registry.registerTest(Tests.acceptedValues("orders_bad",
      "status", Seq("placed", "shipped", "completed")))
    assert(Runner.run(api, Runner.RunConfig()) == 1)
    assert(api.ledger.all.exists(r =>
      r.node == "accepted_values_orders_bad_status" &&
        r.status == Status.Failure))

    // numeric values work unquoted, like dbt's `quote: false`
    api.writeToModel(Seq((1L, 1), (2L, 7)).toDF("id", "code"), "coded")
    assert(Tests.acceptedValues("coded", "code", Seq(1, 2, 3))
      .violations(api) == 1)
  }

  test("per-model scheduler pool is set during execution (B12 analogue)") {
    val api = freshApi()
    @volatile var seenPool: String = null
    api.registry.register(ModelDef("pooled", ModelKind.Scala((s, _) => {
      seenPool = s.sparkContext.getLocalProperty("spark.scheduler.pool")
      import s.implicits._
      Seq(1L).toDF("x")
    })))
    assert(Runner.run(api, Runner.RunConfig(
      pools = Map("pooled" -> "heavy"))) == 0)
    assert(seenPool == "heavy")
    assert(api.spark.sparkContext
      .getLocalProperty("spark.scheduler.pool") == null)
  }

  test("--vars substitutes into SQL models; defaults apply; missing fails") {
    val api = freshApi()
    import spark.implicits._
    val src = Files.createTempDirectory("graft-src-vars")
    Seq((1L, 5.0), (2L, 20.0), (3L, 50.0)).toDF("id", "v")
      .write.mode("overwrite").parquet(src.resolve("t").toString)
    api.registry.register(SourceDef("ext", "t", src.resolve("t").toString))
    api.registry.register(ModelDef("vars_model",
      ModelKind.Sql("SELECT * FROM {{ source('ext', 't') }} " +
        "WHERE v >= {{ var('cutoff') }} " +
        "AND v <= {{ var('ceiling', '1000') }}")))

    assert(Runner.run(api, Runner.RunConfig(
      vars = Map("cutoff" -> "10"))) == 0)
    assert(api.ref("vars_model").count() == 2) // default ceiling applies

    assert(Runner.run(api, Runner.RunConfig(
      vars = Map("cutoff" -> "10", "ceiling" -> "30"))) == 0)
    assert(api.ref("vars_model").count() == 1)

    // no value and no default → the node fails (non-zero exit)
    assert(Runner.run(api, Runner.RunConfig()) != 0)
  }

  test("--full-refresh rebuilds an incremental model from scratch") {
    val api = freshApi()
    import spark.implicits._
    val src = Files.createTempDirectory("graft-src-fr")
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .write.mode("overwrite").parquet(src.resolve("t").toString)
    api.registry.register(SourceDef("ext", "t", src.resolve("t").toString))
    api.registry.register(ModelDef("fr_model",
      ModelKind.Sql("SELECT * FROM {{ source('ext', 't') }}"),
      incremental = true,
      meta = Map("incremental_strategy" -> "append")))

    assert(Runner.run(api, Runner.RunConfig()) == 0)
    assert(Runner.run(api, Runner.RunConfig()) == 0)
    assert(api.ref("fr_model").count() == 4) // append stacked the rows

    assert(Runner.run(api, Runner.RunConfig(fullRefresh = true)) == 0)
    assert(api.ref("fr_model").count() == 2) // rebuilt, not appended
  }

  test("is_incremental() blocks + {{ this }} read only new rows") {
    val api = freshApi()
    import spark.implicits._
    val src = Files.createTempDirectory("graft-src-this")
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .write.mode("overwrite").parquet(src.resolve("t").toString)
    api.registry.register(SourceDef("ext", "t", src.resolve("t").toString))
    api.registry.register(ModelDef("this_model",
      ModelKind.Sql("SELECT * FROM {{ source('ext', 't') }} " +
        "{% if is_incremental() %} " +
        "WHERE id > (SELECT max(id) FROM {{ this }}) {% endif %}"),
      incremental = true,
      meta = Map("incremental_strategy" -> "append")))

    // first run: block stripped, full load
    assert(Runner.run(api, Runner.RunConfig()) == 0)
    assert(api.ref("this_model").count() == 2)

    // source gains one new and one already-loaded id; only id=3 appends
    Seq((2L, 20.0), (3L, 30.0)).toDF("id", "v")
      .write.mode("overwrite").parquet(src.resolve("t").toString)
    assert(Runner.run(api, Runner.RunConfig()) == 0)
    val rows = api.ref("this_model").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows == Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)))

    // --full-refresh strips the block again: rebuilt from current source
    assert(Runner.run(api, Runner.RunConfig(fullRefresh = true)) == 0)
    assert(api.ref("this_model").count() == 2)

    // unguarded {{ this }} on a never-materialized model fails the node
    api.registry.register(ModelDef("bad_this",
      ModelKind.Sql("SELECT * FROM {{ this }}")))
    assert(Runner.run(api, Runner.RunConfig(
      select = Seq("bad_this"))) != 0)
  }

  test("relationship + singular test builders count violations") {
    val api = freshApi()
    import spark.implicits._
    api.writeToModel(Seq((1L, "x"), (2L, "y")).toDF("id", "s"), "dim")
    api.writeToModel(Seq((10L, 1L), (11L, 3L)).toDF("fk_id", "dim_id"),
      "fact")
    val rel = Tests.relationship("fact", "dim_id", "dim", "id")
    assert(rel.violations(api) == 1) // dim_id=3 is orphaned
    val sing = Tests.singular("no_negative_ids", "fact",
      a => a.ref("fact").filter(org.apache.spark.sql.functions
        .col("fk_id") < 0))
    assert(sing.violations(api) == 0)
  }

  /** VERDICT r4 #5: the standalone `fal run` analogue
    * (`fal_runner.py:34-62`) — scripts execute over the PREVIOUS run's
    * ledger statuses without rebuilding any model; `--before` runs
    * pre-hooks then before scripts, after mode runs after scripts then
    * post-hooks.
    */
  test("runScripts executes standalone over the prior run's statuses") {
    val api = freshApi()
    import spark.implicits._
    api.registry.register(ModelDef("a",
      ModelKind.Scala((s, _) => { import s.implicits._
        Seq(1L).toDF("x") })))

    // flow run writes the ledger the way a previous process would have
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val scripts = Seq(
      NodeGraph.ScriptAttachment("a", "pre.sql", before = true),
      NodeGraph.ScriptAttachment("a", "post.sql", before = false))
    val fns = Map(
      NodeGraph.beforeScriptId("a", "pre.sql") ->
        ((ap: FalApi, _: Map[String, String]) => {
          seen += s"before:${ap.registry.status("a")}"; () }),
      NodeGraph.afterScriptId("a", "post.sql") ->
        ((ap: FalApi, _: Map[String, String]) => {
          seen += s"after:${ap.registry.status("a")}"; () }))
    val config = Runner.RunConfig(scripts = scripts, scriptFns = fns,
      preHooks = Map("a" -> Seq("h1")),
      hookFns = Map("h1" -> ((_, _) => { seen += "hook"; () })))
    assert(Runner.run(api, config) == 0)
    val ledgerPath = Files.createTempDirectory("graft-falrun")
      .resolve("run_results.json").toString
    api.ledger.writeJson(ledgerPath)
    val v1 = api.registry.currentPath("a").get

    // a NEW process: fresh registry state, statuses seeded from the
    // prior ledger; scripts must see them and no model may rebuild
    seen.clear()
    api.registry.setStatus("a", Status.Pending)
    val prior = RunLedger.loadStatuses(ledgerPath)
    assert(Runner.runScripts(api, config, before = false,
      priorStatuses = prior) == 0)
    assert(seen.toSeq == Seq(s"after:${Status.Success}"))
    assert(api.registry.currentPath("a").contains(v1), "model was rebuilt")

    seen.clear()
    assert(Runner.runScripts(api, config, before = true,
      priorStatuses = prior) == 0)
    assert(seen.toSeq == Seq("hook", s"before:${Status.Success}"))

    // selection narrows which models' scripts run
    seen.clear()
    assert(Runner.runScripts(api, config.copy(select = Seq("nothing")),
      before = false, priorStatuses = prior) == 0)
    assert(seen.isEmpty)

    // global scripts: run last in after mode on unselected invocations
    // (fal_runner.py:58-62), suppressed by selection unless --globals
    val gConfig = config.copy(
      globalScriptsAfter = Seq("g.sql"),
      scriptFns = config.scriptFns +
        ("script.GLOBAL.AFTER.g.sql" ->
          ((_: FalApi, _: Map[String, String]) => { seen += "global"; () })))
    seen.clear()
    assert(Runner.runScripts(api, gConfig, before = false,
      priorStatuses = prior) == 0)
    assert(seen.toSeq == Seq(s"after:${Status.Success}", "global"))
    seen.clear()
    assert(Runner.runScripts(api, gConfig.copy(select = Seq("a")),
      before = false, priorStatuses = prior) == 0)
    assert(seen.toSeq == Seq(s"after:${Status.Success}"))
    seen.clear()
    assert(Runner.runScripts(api,
      gConfig.copy(select = Seq("a"), runGlobals = true),
      before = false, priorStatuses = prior) == 0)
    assert(seen.toSeq == Seq(s"after:${Status.Success}", "global"))

    // --all runs every model's scripts without a prior artifact (ref
    // fal_runner._get_filtered_models), but is an ERROR next to
    // selection flags (ref fal_runner.py:37-41)
    seen.clear()
    api.registry.setStatus("a", Status.Pending)
    assert(Runner.runScripts(api, config.copy(allModels = true),
      before = false) == 0)
    assert(seen.toSeq == Seq(s"after:${Status.Pending}"))
    intercept[IllegalArgumentException] {
      Runner.runScripts(api,
        config.copy(allModels = true, select = Seq("a")), before = false)
    }
    // default after-mode without a prior artifact is the reference's
    // parse error, not a silent no-op (ref fal_runner.py:148-151)
    intercept[IllegalArgumentException] {
      Runner.runScripts(api, config, before = false)
    }
    // a skipped prior status excludes the model in default mode
    seen.clear()
    assert(Runner.runScripts(api, config, before = false,
      priorStatuses = Map("a" -> Status.Skipped)) == 0)
    assert(seen.isEmpty)

    // --scripts narrows to the named files and suppresses globals
    // like a selector does (ref _select_scripts/_handle_global_scripts)
    seen.clear()
    assert(Runner.runScripts(api,
      gConfig.copy(scriptsOnly = Seq("post.sql")),
      before = false, priorStatuses = prior) == 0)
    assert(seen.toSeq == Seq(s"after:${Status.Success}"))
    seen.clear()
    assert(Runner.runScripts(api,
      gConfig.copy(scriptsOnly = Seq("nope.sql")),
      before = false, priorStatuses = prior) == 0)
    assert(seen.isEmpty)
  }

  /** VERDICT r4 #4 (runner level, mirroring `test_cli.py:132-147`): a
    * selected model builds from a deferred upstream that this run never
    * materializes.
    */
  test("flow run with defer builds a model from the state root's upstream") {
    import spark.implicits._
    val stateRoot = Files.createTempDirectory("graft-state-r").toString
    val stateApi = new FalApi(spark, new Registry(stateRoot), new RunLedger)
    stateApi.writeToModel(Seq(2L, 3L).toDF("x"), "up")

    val api = new FalApi(spark,
      new Registry(Files.createTempDirectory("graft-defer-r").toString),
      new RunLedger, defer = Some(new Registry(stateRoot)))
    api.registry.register(ModelDef("up",
      ModelKind.Sql("SELECT 999 AS x"))) // would be wrong if rebuilt
    api.registry.register(ModelDef("down",
      ModelKind.Sql("SELECT sum(x) AS s FROM {{ ref('up') }}"),
      deps = Seq("up")))
    // select ONLY down: up stays unbuilt locally, ref defers to state
    assert(Runner.run(api, Runner.RunConfig(select = Seq("down"))) == 0)
    assert(api.ref("down").head().getLong(0) == 5L)
    assert(api.registry.currentPath("up").isEmpty)
  }
}
