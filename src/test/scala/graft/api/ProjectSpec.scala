package graft.api

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.plans.Runner

/** Project-directory loading (the dbt-project-parse analogue) driven
  * against the in-repo `examples/jaffle` fixture.
  */
class ProjectSpec extends AnyFunSuite {

  test("ref/source extraction from SQL text") {
    val sql = """SELECT * FROM {{ ref('a') }}
                |JOIN {{ ref('b') }} USING (k)
                |JOIN {{ source('s', 't') }} USING (k)
                |JOIN {{ ref('a') }} a2 USING (k)""".stripMargin
    assert(Project.extractRefs(sql) == Seq("a", "b"))
    assert(Project.extractSources(sql) == Seq(("s", "t")))
  }

  test("example project loads with deps, tags, and sources") {
    val storage = Files.createTempDirectory("graft-proj").toString
    val registry = Project.load("examples/jaffle", storage)
    val models = registry.listModels.map(m => m.name -> m).toMap
    assert(models.keySet ==
      Set("stg_orders", "customer_orders", "vip_customers",
        "order_events", "payment_methods", "payment_fees"))
    assert(models("customer_orders").deps == Seq("stg_orders"))
    assert(models("payment_methods").kind.isInstanceOf[ModelKind.Seed])
    assert(models("payment_fees").deps == Seq("payment_methods"))
    assert(models("customer_orders").tags == Set("daily"))
    assert(models("vip_customers").deps == Seq("customer_orders"))
    assert(models("order_events").incremental &&
      models("order_events").meta.get("incremental_strategy")
        .contains("append"))
    assert(registry.listSources.map(s => (s.sourceName, s.tableName))
      .toSet == Set(("warehouse", "orders"), ("warehouse", "customer")))
  }

  test("named selectors load from selectors.conf (--selector analogue)") {
    val defs = Project.loadSelectors("examples/jaffle")
    assert(defs("staging") == Seq("tag:staging"))
    assert(defs("orders_flow") == Seq("+customer_orders", "vip_customers"))
    assert(Project.loadSelectors("examples").isEmpty) // no conf file
    // an empty expression list must be a parse error, not an
    // accidental select-everything
    val dir = Files.createTempDirectory("graft-selconf")
    Files.writeString(dir.resolve("selectors.conf"), "nightly =\n")
    intercept[IllegalArgumentException] {
      Project.loadSelectors(dir.toString)
    }
  }

  test("python models load with extracted deps and named environments") {
    // ref 008_pure_python_models + 013_structured_hooks'
    // fal_project.yml environments list
    val dir = Files.createTempDirectory("graft-proj-py")
    Files.createDirectories(dir.resolve("models"))
    Files.writeString(dir.resolve("models/base.sql"),
      "SELECT 1 AS x")
    Files.writeString(dir.resolve("models/enrich.py"),
      """import pandas as pd
        |def model(dbt, fal):
        |    df = dbt.ref("base")
        |    other = dbt.ref('base')  # same dep, both quote styles
        |    return df
        |""".stripMargin)
    Files.writeString(dir.resolve("models/enrich.meta"),
      "environment=funny\ntags=py\n")
    Files.writeString(dir.resolve("environments.conf"),
      """# fal_project.yml environments analogue
        |not-funny = venv
        |funny = venv pyjokes==0.6.0
        |funny-conda = conda pyjokes=0.6.0
        |""".stripMargin)
    val storage = Files.createTempDirectory("graft-proj-py-st").toString
    val registry = Project.load(dir.toString, storage)
    val m = registry.modelOpt("enrich").get
    assert(m.deps == Seq("base"))
    assert(m.tags == Set("py"))
    m.kind match {
      case ModelKind.Python(path, env) =>
        assert(path.endsWith("enrich.py"))
        assert(env == Seq("pyjokes==0.6.0"))
      case other => fail(s"expected Python kind, got $other")
    }
    assert(Project.loadEnvironments(dir.toString)("funny-conda") ==
      Seq("conda", "pyjokes=0.6.0"))
    assert(Project.loadEnvironments(dir.toString)("not-funny").isEmpty)

    // unknown environment name is a load-time error, not a silent
    // bare-interpreter fallback
    Files.writeString(dir.resolve("models/enrich.meta"),
      "environment=bogus\n")
    intercept[IllegalArgumentException] {
      Project.load(dir.toString,
        Files.createTempDirectory("graft-proj-py-st2").toString)
    }
  }

  test("project-declared tests load and run, promoting status to tested") {
    val storage = Files.createTempDirectory("graft-proj-t").toString
    val registry = Project.load("examples/jaffle", storage)
    assert(registry.testsFor("customer_orders").map(_.name).toSet ==
      Set("not_null_customer_orders_customer_id",
        "unique_customer_orders_customer_id",
        "relationships_customer_orders_customer_id__stg_orders"))
    // the jaffle fixture's third generic test shape (ref
    // `002_jaffle_shop/models/staging/schema.yml:25`)
    assert(registry.testsFor("stg_orders").map(_.name).toSet ==
      Set("accepted_values_stg_orders_o_orderstatus"))
    val api = new FalApi(TestSpark.spark, registry, new RunLedger)
    assert(Runner.run(api, Runner.RunConfig(
      select = Seq("+customer_orders"))) == 0)
    assert(registry.status("customer_orders") == Status.Tested)
    assert(registry.status("stg_orders") == Status.Tested)
  }

  test("seed roots the DAG and materializes typed rows") {
    val storage = Files.createTempDirectory("graft-proj-seed").toString
    val registry = Project.load("examples/jaffle", storage)
    val api = new FalApi(TestSpark.spark, registry, new RunLedger)
    assert(Runner.run(api, Runner.RunConfig(
      select = Seq("+payment_fees"))) == 0)
    assert(api.registry.relationExists("payment_methods"))
    val fees = api.ref("payment_fees")
    assert(fees.count() == 4)
    // inferSchema typed the seed column as integer, not string
    assert(fees.schema("fee_bps").dataType ==
      org.apache.spark.sql.types.IntegerType)
    // int / decimal-literal division yields decimal in Spark SQL
    assert(fees.filter(org.apache.spark.sql.functions.col("method") ===
      "credit_card").head().getDecimal(2).doubleValue == 0.025)
  }

  test("executeSql on an unmaterialized ref fails with a clear error") {
    val storage = Files.createTempDirectory("graft-proj-e").toString
    val registry = Project.load("examples/jaffle", storage)
    val api = new FalApi(TestSpark.spark, registry, new RunLedger)
    val e = intercept[IllegalStateException] {
      api.executeSql("SELECT * FROM {{ ref('customer_orders') }}")
    }
    assert(e.getMessage.contains("not materialized"))
  }

  test("bad test line is rejected at load") {
    val dir = Files.createTempDirectory("graft-badproj")
    Files.createDirectories(dir.resolve("models"))
    Files.writeString(dir.resolve("models/m.sql"), "SELECT 1 AS x")
    Files.writeString(dir.resolve("models/m.tests"), "bogus x y z")
    intercept[IllegalArgumentException] {
      Project.load(dir.toString,
        Files.createTempDirectory("graft-badproj-s").toString)
    }
  }

  test("loaded project runs end-to-end with selection") {
    val storage = Files.createTempDirectory("graft-proj-run").toString
    val registry = Project.load("examples/jaffle", storage)
    val api = new FalApi(TestSpark.spark, registry, new RunLedger)
    // select customer_orders and its ancestors only
    val status = Runner.run(api, Runner.RunConfig(
      select = Seq("+customer_orders"),
      tags = registry.listModels.map(m => m.name -> m.tags).toMap))
    assert(status == 0)
    assert(api.registry.relationExists("customer_orders"))
    assert(!api.registry.relationExists("vip_customers"))
    assert(api.ref("customer_orders").count() == 150)
    // tag selection picks the tagged model
    val status2 = Runner.run(api,
      Runner.RunConfig(select = Seq("tag:daily"),
        tags = registry.listModels.map(m => m.name -> m.tags).toMap))
    assert(status2 == 0)
  }

  test("project SQL scripts attach from meta and run standalone (fal run)") {
    val storage = Files.createTempDirectory("graft-proj-scripts").toString
    val registry = Project.load("examples/jaffle", storage)
    val api = new FalApi(TestSpark.spark, registry, new RunLedger)
    val (scripts, fns) = graft.Cli.scriptConfig(registry, "examples/jaffle")
    assert(scripts.exists(s =>
      s.model == "customer_orders" && s.file == "orders_report.sql"
        && !s.before))
    val tags = registry.listModels.map(m => m.name -> m.tags).toMap
    // unselected: the whole DAG, so the AFTER script node (a
    // descendant of its model) is in the plan
    val config = Runner.RunConfig(
      scripts = scripts, scriptFns = fns, tags = tags)
    assert(Runner.run(api, config) == 0)
    val ledgerPath = java.nio.file.Paths
      .get(storage, "run_results.json").toString
    api.ledger.writeJson(ledgerPath)
    val scriptId = graft.plans.NodeGraph.afterScriptId(
      "customer_orders", "orders_report.sql")
    assert(api.ledger.statusOf(scriptId).contains(Status.Success))
    // standalone re-run (the `fal run` analogue): script executes again
    // over the prior statuses, no model rebuild; the project-level
    // GLOBAL script runs last
    val (gBefore, gAfter, gFns) =
      graft.Cli.globalScriptConfig("examples/jaffle")
    assert(gBefore.isEmpty && gAfter == Seq("corpus_summary.sql"))
    val v = api.registry.currentPath("customer_orders").get
    assert(Runner.runScripts(api,
      config.copy(globalScriptsAfter = gAfter,
        scriptFns = fns ++ gFns),
      before = false,
      priorStatuses = RunLedger.loadStatuses(ledgerPath)) == 0)
    assert(api.registry.currentPath("customer_orders").contains(v))
    assert(api.ledger.statusOf("script.GLOBAL.AFTER.corpus_summary.sql")
      .contains(Status.Success))
  }

  test("--target resolves named profiles; one project runs against " +
      "two targets (ref args.py:85-93, load_db_profile.py:40-81)") {
    val proj = Files.createTempDirectory("graft-proj-targets")
    Files.createDirectories(proj.resolve("models"))
    Files.writeString(proj.resolve("models/m1.sql"), "SELECT 42 AS x")
    val devStore = Files.createTempDirectory("graft-tgt-dev").toString
    val prodStore = Files.createTempDirectory("graft-tgt-prod").toString
    Files.writeString(proj.resolve("project.meta"),
      s"""target.default=dev
         |target.dev.storage=$devStore
         |target.dev.threads=2
         |target.dev.spark.sql.shuffle.partitions=2
         |target.prod.storage=$prodStore
         |target.prod.threads=8
         |""".stripMargin)

    // parse surface
    val targets = Project.loadTargets(proj.toString)
    assert(targets.keySet == Set("dev", "prod"))
    assert(targets("dev") == Map(
      "storage" -> devStore, "threads" -> "2",
      "spark.sql.shuffle.partitions" -> "2"))
    assert(Project.defaultTarget(proj.toString).contains("dev"))

    // resolution: default target, explicit target, flag precedence,
    // unknown-name error (the reference's load_db_profile error path)
    val dev = graft.Cli.resolveTarget(proj.toString, None, None, None)
    assert(dev.name.contains("dev") && dev.storage == devStore &&
      dev.threads == 2 &&
      dev.sparkConf == Map("spark.sql.shuffle.partitions" -> "2"))
    val prod = graft.Cli.resolveTarget(
      proj.toString, Some("prod"), None, None)
    assert(prod.storage == prodStore && prod.threads == 8 &&
      prod.sparkConf.isEmpty)
    val flagged = graft.Cli.resolveTarget(
      proj.toString, Some("prod"), Some("/tmp/x"), Some(3))
    assert(flagged.storage == "/tmp/x" && flagged.threads == 3)
    val err = intercept[IllegalArgumentException] {
      graft.Cli.resolveTarget(proj.toString, Some("staging"), None, None)
    }
    assert(err.getMessage.contains("staging") &&
      err.getMessage.contains("dev"))
    // a typoed key inside a target block fails loudly too (the
    // reference's bad-profile posture), never a silent default
    val proj2 = Files.createTempDirectory("graft-proj-typo")
    Files.writeString(proj2.resolve("project.meta"),
      "target.prod.thread=16\ntarget.prod.storage=/tmp/x\n")
    val typo = intercept[IllegalArgumentException] {
      graft.Cli.resolveTarget(proj2.toString, Some("prod"), None, None)
    }
    assert(typo.getMessage.contains("thread") &&
      typo.getMessage.contains("unrecognized"))
    // a target-less project keeps the historical defaults
    val bare = graft.Cli.resolveTarget("examples/jaffle", None, None, None)
    assert(bare.name.isEmpty && bare.threads == 4)

    // the SAME project runs against both targets: each run lands its
    // relation under its own storage root, independently readable
    for (t <- Seq(dev, prod)) {
      val registry = Project.load(proj.toString, t.storage)
      val api = new FalApi(TestSpark.spark, registry, new RunLedger)
      assert(Runner.run(api, Runner.RunConfig(threads = t.threads)) == 0)
      assert(api.ref("m1").head.getInt(0) == 42)
    }
    val reg2 = new Registry(devStore)
    assert(reg2.relationExists("m1"))
    assert(new Registry(prodStore).relationExists("m1"))
  }

  test("fal-scripts-path relocates the scripts dir (ref parse.py:143-152)") {
    // a project whose scripts live under tools/sql instead of scripts/
    val proj = Files.createTempDirectory("graft-proj-relocated")
    Files.createDirectories(proj.resolve("models"))
    Files.createDirectories(proj.resolve("tools/sql"))
    Files.writeString(proj.resolve("models/m1.sql"), "SELECT 1 AS x")
    Files.writeString(proj.resolve("models/m1.meta"),
      "scripts_after=report.sql")
    Files.writeString(proj.resolve("project.meta"),
      "fal-scripts-path=tools/sql")
    Files.writeString(proj.resolve("tools/sql/report.sql"),
      "SELECT count(*) AS n FROM {{ ref('m1') }}")
    assert(Project.scriptsDir(proj.toString) == proj.resolve("tools/sql"))
    // default stays <project>/scripts when the key is absent
    assert(Project.scriptsDir("examples/jaffle")
      == java.nio.file.Paths.get("examples/jaffle").resolve("scripts"))

    val storage = Files.createTempDirectory("graft-proj-reloc-store").toString
    val registry = Project.load(proj.toString, storage)
    val api = new FalApi(TestSpark.spark, registry, new RunLedger)
    val (scripts, fns) = graft.Cli.scriptConfig(registry, proj.toString)
    val tags = registry.listModels.map(m => m.name -> m.tags).toMap
    val config = Runner.RunConfig(
      scripts = scripts, scriptFns = fns, tags = tags)
    assert(Runner.run(api, config) == 0)
    val ledgerPath = java.nio.file.Paths
      .get(storage, "run_results.json").toString
    api.ledger.writeJson(ledgerPath)
    val scriptId = graft.plans.NodeGraph.afterScriptId("m1", "report.sql")
    assert(api.ledger.statusOf(scriptId).contains(Status.Success))
    // standalone --run-scripts after (fal run) resolves the same path
    assert(Runner.runScripts(api, config, before = false,
      priorStatuses = RunLedger.loadStatuses(ledgerPath)) == 0)
  }
}
