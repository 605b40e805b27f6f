package graft.plans

import scala.collection.mutable

import graft.api.{FalApi, Status}

/** B5 — task taxonomy (ref: `A/fal/dbt/planner/tasks.py:160-297`,
  * `schedule.py:26-103`): a node executes as one main task plus pre/post
  * hook tasks. Tasks return 0 on success (the reference's int status
  * convention, `tasks.py:48-53`).
  */
sealed trait Task {
  def id: String
  def execute(api: FalApi): Int
}

/** Run one model (SQL via executeSql+write, or a Scala function). */
final case class ModelTask(id: String, run: FalApi => Unit) extends Task {
  def execute(api: FalApi): Int =
    try { run(api); api.ledger.record(id, Status.Success); 0 }
    catch { case e: Throwable =>
      api.ledger.record(id, Status.Failure, String.valueOf(e.getMessage)); 1
    }
}

/** A chunk of SQL models run back-to-back in one task (B4): they
  * pipeline as lazy DataFrames; one task boundary, N writes.
  */
final case class ChunkTask(id: String, members: Seq[ModelTask])
    extends Task {
  def execute(api: FalApi): Int =
    members.foldLeft(0)((st, m) => if (st != 0) st else m.execute(api))
}

/** Hook / standalone script task — gets the write-blocked API view
  * (B11, `fal_script.py:290-296`) and its `with:` arguments (D4).
  */
final case class HookTask(id: String,
    run: (FalApi, Map[String, String]) => Unit,
    arguments: Map[String, String] = Map.empty) extends Task {
  def execute(api: FalApi): Int =
    try { run(api.forHook, arguments)
      api.ledger.record(id, Status.Success); 0 }
    catch { case e: Throwable =>
      api.ledger.record(id, Status.Failure, String.valueOf(e.getMessage)); 1
    }
}

/** A schedulable unit: main task + hooks + dependency set (ref
  * `TaskGroup`, `schedule.py:26-50`).
  */
final class TaskGroup(
    val id: String,
    val task: Task,
    val preHooks: Seq[Task] = Nil,
    val postHooks: Seq[Task] = Nil) {
  var status: String = Status.Pending
  /** Remaining unfinished dependencies; starts as ALL ancestors (ref
    * `schedule_graph`: `nx.ancestors`, `schedule.py:189-200`).
    */
  val dependencies: mutable.Set[TaskGroup] = mutable.Set.empty
}

/** B6 — dynamic ready-set scheduler with dependant-count priority,
  * ported from `Scheduler` (`schedule.py:107-186`): score = (#groups
  * blocked solely by this, #groups blocked partly by this); failure
  * SKIPs all pending groups that still depend on the failed one
  * (dependencies are full ancestor sets, so this reaches every
  * transitive descendant); success removes the group from others'
  * dependency sets.
  */
final class Scheduler(val groups: Seq[TaskGroup]) {

  def pendingGroups: Seq[TaskGroup] =
    groups.filter(_.status == Status.Pending)

  def hasPending: Boolean = pendingGroups.nonEmpty

  private[plans] def calculateScore(target: TaskGroup): (Int, Int) = {
    var direct = 0
    var indirect = 0
    pendingGroups.foreach { g =>
      if (!(g eq target) && g.dependencies.exists(_ eq target)) {
        indirect += 1
        if (g.dependencies.size == 1) direct += 1
      }
    }
    (direct, indirect)
  }

  def finish(target: TaskGroup, status: Int): Unit = synchronized {
    if (status == 0) {
      target.status = Status.Success
      pendingGroups.foreach(_.dependencies.filterInPlace(!_.eq(target)))
    } else {
      target.status = Status.Failure
      pendingGroups.foreach { g =>
        if (g.dependencies.exists(_ eq target)) g.status = Status.Skipped
      }
    }
  }

  /** Stage and return all currently-unblocked groups, highest score
    * first (ref `iter_available_groups:173-186`).
    */
  def availableGroups(): Seq[TaskGroup] = synchronized {
    val unblocked = pendingGroups.filter(_.dependencies.isEmpty)
      .sortBy(g => calculateScore(g))(
        Ordering.Tuple2[Int, Int].reverse)
    unblocked.foreach(_.status = "running")
    unblocked
  }
}

object Scheduler {

  /** Build groups from a planned graph (ref `schedule_graph
    * schedule.py:189-200`): one group per node, dependencies = all
    * graph ancestors.
    */
  def fromGraph(graph: Digraph, taskFor: String => Task,
      hooksFor: String => (Seq[Task], Seq[Task]) =
        _ => (Nil, Nil)): Scheduler = {
    val groupsById = graph.nodes.keys.map { id =>
      val (pre, post) = hooksFor(id)
      id -> new TaskGroup(id, taskFor(id), pre, post)
    }.toMap
    groupsById.foreach { case (id, g) =>
      graph.ancestors(id).foreach(a => g.dependencies += groupsById(a))
    }
    new Scheduler(graph.nodes.keys.toSeq.map(groupsById))
  }
}
