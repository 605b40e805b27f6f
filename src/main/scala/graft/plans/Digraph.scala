package graft.plans

import scala.collection.immutable.{SortedMap, SortedSet}

/** Node kinds, mirroring the reference's `NodeKind`
  * (`/root/reference/projects/adapter/src/fal/dbt/node_graph.py`):
  * DbtModel = SQL model (chunkable), FalModel = Scala-function model,
  * FalScript = before/after script node.
  */
sealed trait NodeKind
object NodeKind {
  case object DbtModel extends NodeKind
  case object FalModel extends NodeKind
  case object FalScript extends NodeKind
}

/** Per-node graph properties (ref: node attrs set in
  * `NodeGraph.from_fal_dbt`, `node_graph.py:100-141`).
  */
final case class NodeProps(
    kind: NodeKind,
    preHook: Seq[String] = Nil,
    postHook: Seq[String] = Nil,
    /** For chunked nodes: the member ids in topological order. */
    members: Seq[String] = Nil,
    exitNode: Option[String] = None)

/** Immutable DAG over string node ids — the hand-rolled replacement for
  * networkx (SURVEY.md §2b B1). Deterministic: all iteration orders are
  * sorted, so plans and schedules are stable run to run.
  */
final case class Digraph(
    nodes: SortedMap[String, NodeProps],
    edgeSet: Set[(String, String)]) {

  lazy val successors: Map[String, SortedSet[String]] = {
    val base = nodes.keys.map(_ -> SortedSet.empty[String]).toMap
    edgeSet.foldLeft(base) { case (m, (a, b)) => m.updated(a, m(a) + b) }
  }
  lazy val predecessors: Map[String, SortedSet[String]] = {
    val base = nodes.keys.map(_ -> SortedSet.empty[String]).toMap
    edgeSet.foldLeft(base) { case (m, (a, b)) => m.updated(b, m(b) + a) }
  }

  def contains(id: String): Boolean = nodes.contains(id)

  private def reach(start: String,
      step: Map[String, SortedSet[String]],
      maxDepth: Int = Int.MaxValue): SortedSet[String] = {
    var frontier = step.getOrElse(start,
      throw new NoSuchElementException(s"node not in graph: $start"))
    var seen = SortedSet.empty[String]
    var depth = 1
    while (frontier.nonEmpty && depth <= maxDepth) {
      seen = seen ++ frontier
      frontier = frontier.flatMap(step(_)) -- seen
      depth += 1
    }
    seen
  }

  /** All transitive descendants (ref `get_descendants node_graph.py`). */
  def descendants(id: String): SortedSet[String] = reach(id, successors)

  /** All transitive ancestors (ref `get_ancestors`). */
  def ancestors(id: String): SortedSet[String] = reach(id, predecessors)

  /** Descendants within `levels` hops (ref `get_successors`). */
  def successorsWithin(id: String, levels: Int): SortedSet[String] =
    reach(id, successors, levels)

  /** Ancestors within `levels` hops (ref `get_predecessors`). */
  def predecessorsWithin(id: String, levels: Int): SortedSet[String] =
    reach(id, predecessors, levels)

  /** Kahn's algorithm with sorted tie-break (deterministic). */
  def topologicalSort: Seq[String] = {
    val inDeg = scala.collection.mutable.Map.empty[String, Int]
    nodes.keys.foreach(n => inDeg(n) = predecessors(n).size)
    var ready = SortedSet.empty[String] ++ nodes.keys.filter(inDeg(_) == 0)
    val out = Seq.newBuilder[String]
    var count = 0
    while (ready.nonEmpty) {
      val n = ready.head
      ready -= n
      out += n
      count += 1
      successors(n).foreach { s =>
        inDeg(s) -= 1
        if (inDeg(s) == 0) ready += s
      }
    }
    require(count == nodes.size, "graph has a cycle")
    out.result()
  }

  def addEdges(es: Iterable[(String, String)]): Digraph =
    copy(edgeSet = edgeSet ++ es)

  def addNode(id: String, props: NodeProps): Digraph =
    copy(nodes = nodes.updated(id, props))

  /** Remove nodes and all incident edges (networkx remove_node). */
  def removeNodes(ids: Set[String]): Digraph =
    Digraph(nodes -- ids,
      edgeSet.filterNot { case (a, b) => ids(a) || ids(b) })
}

object Digraph {
  def apply(nodeList: Seq[(String, NodeProps)],
      edges: Seq[(String, String)]): Digraph = {
    val g = Digraph(SortedMap(nodeList: _*), edges.toSet)
    val unknown = g.edgeSet.flatMap(e => Seq(e._1, e._2))
      .filterNot(g.nodes.contains)
    require(unknown.isEmpty, s"edges reference unknown nodes: $unknown")
    g
  }
}
