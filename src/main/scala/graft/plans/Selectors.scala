package graft.plans

import scala.collection.immutable.SortedSet
import scala.util.matching.Regex

/** B2 — dbt-style graph selection algebra, ported from the reference's
  * regex grammar (`/root/reference/projects/adapter/src/fal/dbt/cli/
  * selectors.py:294-300`):
  *
  *   `@model`   children with their parents   (`^@(?<rest>.*)`)
  *   `n+model`  ancestors to depth n          (`^(?<depth>\d*)\+`)
  *   `model+n`  descendants to depth n        (`\+(?<depth>\d*)$`)
  *   `tag:x`    tag selection
  *   `x.py`     script-name expansion (substring containment,
  *              `_expand_script selectors.py:137-146`)
  *   space      union, comma intersection (`:294-296`)
  *
  * Semantics pinned to the reference: `@` with a trailing `+` is an
  * error (`:199-203`); selecting a node not in the graph is ignored, not
  * fatal (`_filter_node_ids:108-118`).
  */
object Selectors {

  private val OpChildrenWithParents: Regex = "^@(.*)".r
  private val OpParents: Regex = "^(\\d*)\\+(.*)".r
  private val OpChildren: Regex = "(.*)\\+(\\d*)$".r

  final case class SelectorPlan(
      raw: String,
      bare: String,
      childrenWithParents: Boolean,
      parents: Boolean,
      parentsLevels: Option[Int],
      children: Boolean,
      childrenLevels: Option[Int]) {

    /** Resolve the bare selector to node ids (model id, script
      * substring expansion, or tag set).
      */
    def uniqueIds(graph: Digraph, tags: Map[String, Set[String]])
        : Seq[String] =
      if (bare.startsWith("tag:")) {
        val tag = bare.drop(4)
        graph.nodes.keys.filter(id =>
          tags.getOrElse(NodeGraph.modelName(id), Set.empty)
            .contains(tag)).toSeq
      } else if (bare.endsWith(".py") || bare.endsWith(".ipynb") ||
        bare.endsWith(".scala")) {
        graph.nodes.keys.filter(_.contains(bare)).toSeq
      } else Seq(NodeGraph.modelId(bare))

    def execute(graph: Digraph, tags: Map[String, Set[String]])
        : SortedSet[String] = {
      var out = SortedSet.empty[String]
      uniqueIds(graph, tags).foreach { id =>
        // nonexistent selection is skipped, not an error
        if (graph.contains(id)) {
          out += id
          if (children) out ++= (childrenLevels match {
            case Some(n) => graph.successorsWithin(id, n)
            case None => graph.descendants(id)
          })
          if (parents) out ++= (parentsLevels match {
            case Some(n) => graph.predecessorsWithin(id, n)
            case None => graph.ancestors(id)
          })
          if (childrenWithParents) {
            val ch = graph.descendants(id)
            out ++= ch
            ch.foreach(c => out ++= graph.ancestors(c))
          }
        }
      }
      out
    }
  }

  def parse(selector: String): SelectorPlan = {
    var rest = selector
    val cwp = OpChildrenWithParents.findFirstMatchIn(rest) match {
      case Some(m) => rest = m.group(1); true
      case None => false
    }
    var parents = false
    var parentsLevels: Option[Int] = None
    OpParents.findFirstMatchIn(rest).foreach { m =>
      parents = true
      parentsLevels = if (m.group(1).isEmpty) None else Some(m.group(1).toInt)
      rest = m.group(2)
    }
    var children = false
    var childrenLevels: Option[Int] = None
    OpChildren.findFirstMatchIn(rest).foreach { m =>
      children = true
      childrenLevels = if (m.group(2).isEmpty) None else Some(m.group(2).toInt)
      rest = m.group(1)
    }
    if (cwp && children)
      throw new IllegalArgumentException(
        s"""Invalid node spec $selector - "@" prefix and "+" suffix are incompatible""")
    SelectorPlan(selector, rest, cwp, parents, parentsLevels, children,
      childrenLevels)
  }

  /** Space = union of comma-intersections (ref `parse_union` +
    * `_filter_node_ids`). Multiple selector strings union.
    */
  def select(graph: Digraph, selectors: Seq[String],
      tags: Map[String, Set[String]] = Map.empty): SortedSet[String] = {
    if (selectors.isEmpty) return SortedSet.empty[String] ++ graph.nodes.keys
    var out = SortedSet.empty[String]
    selectors.flatMap(_.split(" ").toSeq).filter(_.nonEmpty)
      .foreach { unionComponent =>
        val parts = unionComponent.split(",").toSeq.filter(_.nonEmpty)
        val sets = parts.map(p => parse(p).execute(graph, tags))
        if (sets.nonEmpty)
          out ++= sets.reduce(_ intersect _)
      }
    out
  }

  /** Full execution plan: select minus exclude (ref
    * `ExecutionPlan.create_plan_from_graph selectors.py:41`).
    */
  def plan(graph: Digraph, selectStrs: Seq[String],
      excludeStrs: Seq[String] = Nil,
      tags: Map[String, Set[String]] = Map.empty): SortedSet[String] = {
    val selected = select(graph, selectStrs, tags)
    if (excludeStrs.isEmpty) selected
    else selected -- select(graph, excludeStrs, tags)
  }
}
