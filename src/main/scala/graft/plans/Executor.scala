package graft.plans

import java.util.concurrent.{Executors, TimeUnit}
import scala.collection.mutable
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future, Promise}

import graft.api.FalApi

/** B7 — parallel group executor, ported from `parallel_executor` +
  * `FutureGroup` (`/root/reference/projects/adapter/src/fal/dbt/planner/
  * executor.py:27-174`).
  *
  * Per-group state machine: PRE_HOOKS → MAIN_TASK → POST_HOOKS, where a
  * pre-hook failure skips the main task but still runs post-hooks
  * (`executor.py:97-104`), and the group status accumulates bitwise-or
  * style (any failure → failure). Groups run on a fixed driver-side
  * thread pool (the reference's `threads` profile knob); each task's
  * Spark actions parallelize across executors on their own.
  */
object Executor {

  private sealed trait State
  private case object PreHooks extends State
  private case object MainTask extends State
  private case object PostHooks extends State

  /** Returns overall exit status: 0 iff every group succeeded (ref
    * `executor.py:177-178` any-failure exit code).
    */
  def run(scheduler: Scheduler, api: FalApi, threads: Int = 4): Int = {
    val pool = Executors.newFixedThreadPool(threads)
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutor(pool)
    val done = Promise[Unit]()
    val lock = new Object
    var inFlight = 0
    var exitStatus = 0

    final class FutureGroup(val group: TaskGroup) {
      var state: State = PreHooks
      var status: Int = 0
      private var remaining = 0

      def start(): Unit = advance()

      private def tasksFor(s: State): Seq[Task] = s match {
        case PreHooks => group.preHooks
        case MainTask => Seq(group.task)
        case PostHooks => group.postHooks
      }

      /** Move through empty stages until tasks exist or the group ends. */
      private def advance(): Unit = {
        val tasks = tasksFor(state)
        if (tasks.nonEmpty) submit(tasks)
        else next()
      }

      private def submit(tasks: Seq[Task]): Unit = {
        remaining = tasks.size
        tasks.foreach { t =>
          Future {
            val st = try t.execute(api) catch { case _: Throwable => 1 }
            complete(st)
          }
          ()
        }
      }

      private def complete(taskStatus: Int): Unit = lock.synchronized {
        status |= taskStatus
        remaining -= 1
        if (remaining == 0) next()
      }

      private def next(): Unit = state match {
        case PreHooks =>
          // pre-hook failure skips the main task, runs post-hooks
          state = if (status == 0) MainTask else PostHooks
          advance()
        case MainTask =>
          state = PostHooks
          advance()
        case PostHooks =>
          finishGroup(this)
      }
    }

    def launchAvailable(): Unit = {
      val avail = scheduler.availableGroups()
      lock.synchronized { inFlight += avail.size }
      avail.foreach(g => new FutureGroup(g).start())
      maybeFinish()
    }

    def finishGroup(fg: FutureGroup): Unit = {
      scheduler.finish(fg.group, fg.status)
      lock.synchronized {
        inFlight -= 1
        if (fg.status != 0) exitStatus = 1
      }
      launchAvailable()
    }

    def maybeFinish(): Unit = lock.synchronized {
      if (inFlight == 0 && !scheduler.hasPending)
        done.trySuccess(())
      ()
    }

    launchAvailable()
    Await.result(done.future, Duration.Inf)
    pool.shutdown()
    pool.awaitTermination(60, TimeUnit.SECONDS)
    exitStatus
  }
}
