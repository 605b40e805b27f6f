package graft.plans

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.api._

/** Port of the reference's parallelism stress fixture
  * (`cli_tests/projects/011_highly_parallelizable/`: two independent
  * flows that must execute concurrently on the thread pool).
  */
class ParallelismSpec extends AnyFunSuite {

  test("independent flows run concurrently, dependents stay ordered") {
    val root = Files.createTempDirectory("graft-par").toString
    val api = new FalApi(TestSpark.spark, new Registry(root), new RunLedger)

    val inFlight = new AtomicInteger(0)
    val maxInFlight = new AtomicInteger(0)
    val finished = new java.util.concurrent.ConcurrentLinkedQueue[String]()

    def task(id: String) = ModelTask(id, _ => {
      val now = inFlight.incrementAndGet()
      maxInFlight.accumulateAndGet(now, math.max)
      Thread.sleep(50)
      inFlight.decrementAndGet()
      finished.add(id)
      ()
    })

    // two independent chains of 3 + 2 free models each (10 nodes)
    val nodes = (for {
      flow <- Seq("f1", "f2")
      n <- Seq("a", "b", "c", "x", "y")
    } yield s"$flow.$n" -> NodeProps(NodeKind.DbtModel))
    val edges = Seq("f1.a" -> "f1.b", "f1.b" -> "f1.c",
      "f2.a" -> "f2.b", "f2.b" -> "f2.c")
    val g = Digraph(nodes, edges)
    val sched = Scheduler.fromGraph(g, task)
    val status = Executor.run(sched, api, threads = 4)

    assert(status == 0)
    assert(finished.size == 10)
    // the two chains + free nodes overlapped on the pool
    assert(maxInFlight.get() >= 2, s"max in flight was ${maxInFlight.get()}")
    // chain order respected within each flow
    val order = finished.toArray.map(_.toString).toSeq
    for (f <- Seq("f1", "f2")) {
      assert(order.indexOf(s"$f.a") < order.indexOf(s"$f.b"))
      assert(order.indexOf(s"$f.b") < order.indexOf(s"$f.c"))
    }
  }
}
