package graft.plans

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.api._

/** Ports of the reference's scheduler/executor tests
  * (`/root/reference/projects/adapter/tests/planner/test_schedule.py:12-155`:
  * scheduling order, failure handling, dependency management; hook state
  * machine `executor.py:87-112`).
  */
class SchedulerSpec extends AnyFunSuite {

  private def api(): FalApi = {
    val root = Files.createTempDirectory("graft-sched").toString
    new FalApi(TestSpark.spark, new Registry(root), new RunLedger)
  }

  private def okTask(id: String, log: ConcurrentLinkedQueue[String]) =
    ModelTask(id, _ => { log.add(id); () })
  private def failTask(id: String, log: ConcurrentLinkedQueue[String]) =
    ModelTask(id, _ => { log.add(id); sys.error(s"boom $id") })

  private def lineGraph(kinds: (String, NodeKind)*): Digraph = {
    val nodes = kinds.map { case (n, k) => n -> NodeProps(k) }
    val edges = kinds.map(_._1).sliding(2).collect {
      case Seq(a, b) => a -> b
    }.toSeq
    Digraph(nodes, edges)
  }

  test("dependency order respected, all succeed (test_scheduler)") {
    val log = new ConcurrentLinkedQueue[String]()
    val g = lineGraph("a" -> NodeKind.DbtModel, "b" -> NodeKind.DbtModel,
      "c" -> NodeKind.DbtModel)
    val sched = Scheduler.fromGraph(g, okTask(_, log))
    val status = Executor.run(sched, api(), threads = 4)
    assert(status == 0)
    assert(log.toArray.toSeq == Seq("a", "b", "c"))
    assert(sched.groups.forall(_.status == Status.Success))
  }

  test("failure skips all transitive dependents (scheduler _fail)") {
    val log = new ConcurrentLinkedQueue[String]()
    // a -> b -> c ; a -> d : b fails → c skipped, d still runs
    val g = Digraph(
      Seq("a" -> NodeProps(NodeKind.DbtModel),
        "b" -> NodeProps(NodeKind.DbtModel),
        "c" -> NodeProps(NodeKind.DbtModel),
        "d" -> NodeProps(NodeKind.DbtModel)),
      Seq("a" -> "b", "b" -> "c", "a" -> "d"))
    val sched = Scheduler.fromGraph(g,
      id => if (id == "b") failTask(id, log) else okTask(id, log))
    val status = Executor.run(sched, api(), threads = 4)
    assert(status == 1)
    val byId = sched.groups.map(gr => gr.id -> gr.status).toMap
    assert(byId("a") == Status.Success)
    assert(byId("b") == Status.Failure)
    assert(byId("c") == Status.Skipped)
    assert(byId("d") == Status.Success)
    assert(!log.contains("c"))
  }

  test("priority favors groups unblocking the most dependants") {
    // hub blocks 3 groups, lone blocks none → hub scores higher
    val g = Digraph(
      Seq("hub" -> NodeProps(NodeKind.DbtModel),
        "lone" -> NodeProps(NodeKind.DbtModel),
        "x" -> NodeProps(NodeKind.DbtModel),
        "y" -> NodeProps(NodeKind.DbtModel),
        "z" -> NodeProps(NodeKind.DbtModel)),
      Seq("hub" -> "x", "hub" -> "y", "hub" -> "z"))
    val sched = Scheduler.fromGraph(g,
      id => ModelTask(id, _ => ()))
    val hub = sched.groups.find(_.id == "hub").get
    val lone = sched.groups.find(_.id == "lone").get
    assert(sched.calculateScore(hub) == ((3, 3)))
    assert(sched.calculateScore(lone) == ((0, 0)))
    val avail = sched.availableGroups()
    assert(avail.head.id == "hub")
  }

  test("pre-hook failure skips main task but still runs post-hooks") {
    val log = new ConcurrentLinkedQueue[String]()
    val group = new TaskGroup("m",
      task = ModelTask("main", _ => { log.add("main"); () }),
      preHooks = Seq(HookTask("pre", (_, _) => sys.error("pre boom"))),
      postHooks = Seq(HookTask("post", (_, _) => { log.add("post"); () })))
    val status = Executor.run(new Scheduler(Seq(group)), api())
    assert(status == 1)
    assert(group.status == Status.Failure)
    assert(!log.contains("main"))
    assert(log.contains("post"))
  }

  test("hook gets write-blocked api and arguments (B11/D4)") {
    val a = api()
    a.writeToModel(TestSpark.spark.range(3).toDF("my_int"), "m")
    var sawArgs: Map[String, String] = Map.empty
    var writeBlocked = false
    val hook = HookTask("h", (hookApi, args) => {
      sawArgs = args
      try hookApi.writeToModel(TestSpark.spark.range(1).toDF(), "m")
      catch { case _: IllegalArgumentException => writeBlocked = true }
    }, arguments = Map("channel" -> "alerts"))
    val group = new TaskGroup("m2", task = ModelTask("noop", _ => ()),
      postHooks = Seq(hook))
    assert(Executor.run(new Scheduler(Seq(group)), a) == 0)
    assert(sawArgs == Map("channel" -> "alerts"))
    assert(writeBlocked)
  }

  test("chunk task runs members in order, stops at first failure") {
    val log = new ConcurrentLinkedQueue[String]()
    val chunk = ChunkTask("chunk", Seq(
      okTask("m1", log), failTask("m2", log), okTask("m3", log)))
    assert(chunk.execute(api()) == 1)
    assert(log.toArray.toSeq == Seq("m1", "m2"))
  }
}
