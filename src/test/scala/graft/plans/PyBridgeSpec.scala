package graft.plans

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.api._

/** D1 flagship behavior: an actual `def model(dbt, fal)` Python file
  * running as a DAG node through PyBridge, reproducing the reference's
  * `simple_project/models/base/python/model_c.py` semantics (helper
  * import from the model dir + bool column + JSON column, round-tripped
  * through parquet back into the engine), and the reference's failure
  * semantics (`executor.py:97-104`): a crashing Python process FAILs
  * its node and transitively SKIPs dependants without harming the
  * session. Cancels (not fails) when no python3+pandas is on PATH.
  */
class PyBridgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshApi(): FalApi = {
    val root = Files.createTempDirectory("graft-py").toString
    new FalApi(spark, new Registry(root), new RunLedger)
  }

  private def baseModel: ModelDef =
    ModelDef("base_model", ModelKind.Scala((s, _) => {
      import s.implicits._
      Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "label")
    }))

  test("python model: bool + JSON columns round-trip through the bridge") {
    assume(PyBridge.available, "python3 with pandas+pyarrow not on PATH")
    val api = freshApi()
    api.registry.register(baseModel)
    val proj = Files.createTempDirectory("graft-pyproj")
    Files.createDirectories(proj.resolve("helpers"))
    Files.writeString(proj.resolve("helpers").resolve("flags.py"),
      "def always_true():\n    return True\n")
    val pyFile = proj.resolve("enrich.py")
    Files.writeString(pyFile,
      """from helpers.flags import always_true
        |import json
        |
        |def model(dbt, fal):
        |    dbt.config(materialized="table")
        |    df = dbt.ref("base_model")
        |    df["my_bool"] = always_true()
        |    df["my_json"] = json.dumps({"a": 1, "b": 2})
        |    return df
        |""".stripMargin)
    api.registry.register(ModelDef("enrich",
      ModelKind.Python(pyFile.toString), deps = Seq("base_model")))

    assert(Runner.run(api, Runner.RunConfig()) == 0)
    val out = api.ref("enrich")
    assert(out.count() == 3)
    assert(out.schema("my_bool").dataType ==
      org.apache.spark.sql.types.BooleanType)
    import org.apache.spark.sql.functions._
    val row = out.agg(
      sum(when(col("my_bool"), 1).otherwise(0)),
      sum(get_json_object(col("my_json"), "$.a").cast("long")),
      countDistinct(col("label"))).head
    assert(row.getLong(0) == 3) // every row kept the bool
    assert(row.getLong(1) == 3) // $.a == 1 parsed from every row
    assert(row.getLong(2) == 3) // original columns survived the hop
  }

  test("crashing python model FAILs, downstream SKIPs, session survives") {
    assume(PyBridge.available, "python3 with pandas+pyarrow not on PATH")
    val api = freshApi()
    api.registry.register(baseModel)
    val proj = Files.createTempDirectory("graft-pyboom")
    val pyFile = proj.resolve("boom.py")
    Files.writeString(pyFile,
      """def model(dbt, fal):
        |    raise RuntimeError("synthetic python-model crash")
        |""".stripMargin)
    api.registry.register(ModelDef("boom",
      ModelKind.Python(pyFile.toString), deps = Seq("base_model")))
    api.registry.register(ModelDef("down",
      ModelKind.Scala((_, a) => a.ref("boom")), deps = Seq("boom")))

    assert(Runner.run(api, Runner.RunConfig()) == 1)
    assert(api.registry.relationExists("base_model"))
    assert(!api.registry.relationExists("boom"))
    assert(!api.registry.relationExists("down")) // transitive SKIP
    // the crash stayed in the child process — driver session unharmed
    assert(spark.range(5).count() == 5)
    assert(api.ledger.statusOf(NodeGraph.modelId("boom"))
      .contains(Status.Failure))
  }
}
