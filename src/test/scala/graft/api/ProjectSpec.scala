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
      Set("stg_orders", "customer_orders", "vip_customers"))
    assert(models("customer_orders").deps == Seq("stg_orders"))
    assert(models("customer_orders").tags == Set("daily"))
    assert(models("vip_customers").deps == Seq("customer_orders"))
    assert(registry.listSources.map(s => (s.sourceName, s.tableName))
      .toSet == Set(("warehouse", "orders"), ("warehouse", "customer")))
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
}
