package graft.plans

import scala.collection.immutable.SortedSet
import scala.collection.mutable

/** B3/B4 — graph filtering, script-edge rewiring, and SQL-chunk
  * planning, ported from `/root/reference/projects/adapter/src/fal/dbt/
  * planner/plan.py:46-206`.
  */
object Plan {

  /** B3a — FilteredGraph: drop unselected nodes (plan.py:46-66). */
  def filtered(graph: Digraph, selected: Set[String]): Digraph =
    graph.removeNodes(graph.nodes.keySet.toSet -- selected)

  /** B3b — ScriptConnectedGraph "shuffle" (plan.py:70-120): after
    * scripts gate the model's downstream (after→succ edges), upstream
    * gates before scripts (pred→before edges), and after scripts also
    * gate the successors' before scripts — so scripts participate in
    * scheduling order exactly like the models they wrap.
    */
  def scriptConnected(graph: Digraph): Digraph = {
    val newEdges = mutable.Buffer.empty[(String, String)]
    graph.nodes.keys.foreach { node =>
      val (afterScripts, otherSuccs) =
        graph.successors(node).partition(NodeGraph.isAfterScript)
      for (a <- afterScripts; s <- otherSuccs) newEdges += (a -> s)

      val (beforeScripts, otherPreds) =
        graph.predecessors(node).partition(NodeGraph.isBeforeScript)
      for (p <- otherPreds; b <- beforeScripts) newEdges += (p -> b)

      for (succ <- otherSuccs) {
        val succBefore =
          graph.predecessors(succ).filter(NodeGraph.isBeforeScript)
        for (a <- afterScripts; b <- succBefore) newEdges += (a -> b)
      }
    }
    graph.addEdges(newEdges)
  }

  /** B4 — "Gorkem's Critical Nodes Algorithm" (plan.py:139-206): group
    * maximal topological runs of pure-SQL nodes with compatible ancestor
    * sets into one chunk node, splitting at Scala models, scripts, and
    * pre/post hooks. In the Spark rebuild a chunk executes as one lazy
    * DataFrame chain — Catalyst fuses it where the reference saved
    * subprocess spawns.
    */
  def chunked(graph: Digraph): Digraph = {
    val subgraphs = findSubgraphs(graph)
    subgraphs.foldLeft(graph)(reduceSubgraph)
  }

  private[plans] def findSubgraphs(graph: Digraph): Seq[Seq[String]] = {
    val out = mutable.Buffer.empty[Seq[String]]
    var currentStack = mutable.Buffer.empty[String]
    var allowedAncestors = SortedSet.empty[String]

    def split(): Unit = {
      if (currentStack.size > 1) out += currentStack.toSeq
      currentStack = mutable.Buffer.empty[String]
      allowedAncestors = SortedSet.empty[String]
    }

    graph.topologicalSort.foreach { node =>
      val props = graph.nodes(node)
      val isBreaker = props.kind == NodeKind.FalModel ||
        props.kind == NodeKind.FalScript || props.preHook.nonEmpty
      if (isBreaker) split()
      else {
        val anc = graph.ancestors(node)
        if (currentStack.isEmpty) allowedAncestors = anc
        if (!anc.subsetOf(allowedAncestors)) split()
        currentStack += node
        allowedAncestors = allowedAncestors ++ anc + node
        if (props.postHook.nonEmpty) split()
      }
    }
    split()
    out.toSeq
  }

  private def reduceSubgraph(graph: Digraph, members: Seq[String])
      : Digraph = {
    val chunkId = s"chunk:${members.mkString("|")}"
    val last = graph.nodes(members.last)
    val memberSet = members.toSet
    val inEdges = graph.edgeSet.collect {
      case (a, b) if memberSet(b) && !memberSet(a) => a -> chunkId
    }
    val outEdges = graph.edgeSet.collect {
      case (a, b) if memberSet(a) && !memberSet(b) => chunkId -> b
    }
    graph
      .addNode(chunkId, last.copy(members = members,
        exitNode = Some(members.last)))
      .removeNodes(memberSet)
      .addEdges(inEdges ++ outEdges)
  }
}
