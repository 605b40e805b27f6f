package graft.plans

import scala.collection.immutable.SortedMap

import graft.api.{ModelDef, Registry}

/** B1 — DAG construction over models + before/after scripts (ref:
  * `NodeGraph.from_fal_dbt`, `/root/reference/projects/adapter/src/fal/
  * dbt/node_graph.py:100-141`; edge rules `_add_after_scripts:38`,
  * `_add_before_scripts:67`).
  *
  * Node id scheme matches the reference so the selector grammar ports
  * verbatim: models are `model.<project>.<name>`, scripts are
  * `script.<model>.BEFORE.<file>` / `script.<model>.AFTER.<file>`.
  */
object NodeGraph {
  val Project = "graft"

  def modelId(name: String): String = s"model.$Project.$name"
  def modelName(id: String): String = id.split('.').drop(2).mkString(".")
  def beforeScriptId(model: String, file: String): String =
    s"script.$model.BEFORE.$file"
  def afterScriptId(model: String, file: String): String =
    s"script.$model.AFTER.$file"

  def isBeforeScript(id: String): Boolean =
    id.matches("^script\\..+\\.BEFORE\\..+")
  def isAfterScript(id: String): Boolean =
    id.matches("^script\\..+\\.AFTER\\..+")

  /** Scripts attached to a model (ref: `meta.fal.scripts` pre/post,
    * `project.py:256-311`).
    */
  final case class ScriptAttachment(model: String, file: String,
      before: Boolean)

  /** Build the DAG: dep→model edges, before-script→model,
    * model→after-script.
    */
  def build(models: Seq[ModelDef],
      scripts: Seq[ScriptAttachment] = Nil,
      kinds: Map[String, NodeKind] = Map.empty,
      preHooks: Map[String, Seq[String]] = Map.empty,
      postHooks: Map[String, Seq[String]] = Map.empty): Digraph = {
    val modelNodes = models.map { m =>
      val kind = kinds.getOrElse(m.name, m.kind match {
        case _: graft.api.ModelKind.Sql => NodeKind.DbtModel
        case _: graft.api.ModelKind.Scala => NodeKind.FalModel
        // Python models are fal-owned nodes like Scala ones (ref
        // node_graph.py:21-35 FalFlowNode) — never SQL-chunked
        case _: graft.api.ModelKind.Python => NodeKind.FalModel
        // a seed is a side-effect-free root — chunkable like SQL (B4)
        case _: graft.api.ModelKind.Seed => NodeKind.DbtModel
      })
      modelId(m.name) -> NodeProps(kind,
        preHook = preHooks.getOrElse(m.name, Nil),
        postHook = postHooks.getOrElse(m.name, Nil))
    }
    val scriptNodes = scripts.map { s =>
      val id = if (s.before) beforeScriptId(s.model, s.file)
        else afterScriptId(s.model, s.file)
      id -> NodeProps(NodeKind.FalScript)
    }
    val depEdges = models.flatMap(m =>
      m.deps.map(d => modelId(d) -> modelId(m.name)))
    val scriptEdges = scripts.map { s =>
      if (s.before) beforeScriptId(s.model, s.file) -> modelId(s.model)
      else modelId(s.model) -> afterScriptId(s.model, s.file)
    }
    Digraph(SortedMap((modelNodes ++ scriptNodes): _*).toSeq,
      depEdges ++ scriptEdges)
  }

  def fromRegistry(registry: Registry,
      scripts: Seq[ScriptAttachment] = Nil): Digraph =
    build(registry.listModels, scripts)
}
