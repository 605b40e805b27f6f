package graft.plans

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.api._

/** B12's fault-isolation half at the hook/script surface: external
  * steps run as child OS processes with parquet handoff ([[Isolated]]),
  * so the reference's failure semantics (`executor.py:97-104`: pre-hook
  * failure skips the main task, a failed group transitively SKIPs
  * dependants) hold even when the step crashes the whole process — and
  * the driver session is untouched.
  */
class IsolatedStepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshApi(): FalApi = {
    val root = Files.createTempDirectory("graft-isolated").toString
    new FalApi(spark, new Registry(root), new RunLedger)
  }

  private def baseModel: ModelDef =
    ModelDef("base", ModelKind.Scala((s, _) => {
      import s.implicits._
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "s")
    }))

  test("external step gets the parquet handoff + args manifest") {
    assume(PyBridge.available, "python3 with pandas+pyarrow not on PATH")
    val api = freshApi()
    api.registry.register(baseModel)
    val dir = Files.createTempDirectory("graft-isoscript")
    val marker = dir.resolve("rowcount.txt")
    val py = dir.resolve("count_rows.py")
    // child is plain python over the manifest: proves nothing crosses
    // the boundary except files (no Spark, no JVM state)
    Files.writeString(py,
      s"""import json, sys
         |import pandas as pd
         |m = json.load(open(sys.argv[1]))
         |df = pd.read_parquet(m["inputs"]["base"])
         |assert m["args"]["threshold"] == "2"
         |kept = df[df["id"] > int(m["args"]["threshold"])]
         |open("${marker.toString}", "w").write(str(len(kept)))
         |""".stripMargin)
    val cfg = Runner.RunConfig(
      postHooks = Map("base" -> Seq("count_rows")),
      hookFns = Map("count_rows" -> ((a, _) =>
        Isolated.step(Seq("python3", py.toString), deps = Seq("base"))(
          a, Map("threshold" -> "2")))))
    assert(Runner.run(api, cfg) == 0)
    assert(Files.readString(marker).trim == "2") // ids 3 and 4
  }

  test("crashing external pre-hook: main task skipped, dependants SKIP, session survives") {
    val api = freshApi()
    api.registry.register(baseModel)
    api.registry.register(ModelDef("mid",
      ModelKind.Scala((_, a) => a.ref("base")), deps = Seq("base")))
    api.registry.register(ModelDef("down",
      ModelKind.Scala((_, a) => a.ref("mid")), deps = Seq("mid")))
    // the step dies on a nonexistent interpreter-level failure (exit 7)
    // — an arbitrary process death, not a JVM exception
    val cfg = Runner.RunConfig(
      preHooks = Map("mid" -> Seq("boom")),
      hookFns = Map("boom" -> ((a, args) =>
        Isolated.step(Seq("sh", "-c", "exit 7"))(a, args))))
    assert(Runner.run(api, cfg) == 1)
    assert(api.registry.relationExists("base"))
    assert(!api.registry.relationExists("mid")) // pre-hook fail → skip
    assert(!api.registry.relationExists("down")) // transitive SKIP
    assert(api.ledger.statusOf(
      s"hook.${NodeGraph.modelId("mid")}.PRE.boom")
      .contains(Status.Failure))
    // driver session unharmed by the child's death
    assert(spark.range(3).count() == 3)
  }

  test("missing binary is a task failure, not a crash") {
    val api = freshApi()
    api.registry.register(baseModel)
    val cfg = Runner.RunConfig(
      postHooks = Map("base" -> Seq("gone")),
      hookFns = Map("gone" -> ((a, args) =>
        Isolated.step(Seq("/nonexistent/binary"))(a, args))))
    assert(Runner.run(api, cfg) == 1)
    assert(api.registry.relationExists("base")) // model itself succeeded
  }
}
