package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.api.{ModelDef, ModelKind}

/** Ports of the reference's planner tests
  * (`/root/reference/projects/adapter/tests/planner/test_plan.py:13-71`
  * subgraph chunking, and the `ScriptConnectedGraph._shuffle` edge
  * rewrites of `plan.py:70-120`).
  */
class PlanSpec extends AnyFunSuite {
  private def sql = ModelKind.Sql("SELECT 1")
  private def scalaKind = ModelKind.Scala((s, _) => s.range(1).toDF())
  private def m(n: String) = NodeGraph.modelId(n)

  test("script rewiring gates downstream on after-scripts") {
    // A -> after(a.py); A -> B with before(b.py)
    val g = NodeGraph.build(
      Seq(ModelDef("A", sql), ModelDef("B", sql, deps = Seq("A"))),
      Seq(NodeGraph.ScriptAttachment("A", "a.py", before = false),
        NodeGraph.ScriptAttachment("B", "b.py", before = true)))
    val sc = Plan.scriptConnected(g)
    val after = NodeGraph.afterScriptId("A", "a.py")
    val before = NodeGraph.beforeScriptId("B", "b.py")
    // after-script now gates B...
    assert(sc.edgeSet.contains(after -> m("B")))
    // ...A gates B's before-script...
    assert(sc.edgeSet.contains(m("A") -> before))
    // ...and the after-script gates the successor's before-script
    assert(sc.edgeSet.contains(after -> before))
  }

  test("chunking groups consecutive SQL nodes (test_plan chunking)") {
    // sql1 -> sql2 -> sql3 all SQL, linear: one chunk of 3
    val g = NodeGraph.build(Seq(
      ModelDef("s1", sql),
      ModelDef("s2", sql, deps = Seq("s1")),
      ModelDef("s3", sql, deps = Seq("s2"))))
    val chunked = Plan.chunked(g)
    assert(chunked.nodes.size == 1)
    val (_, props) = chunked.nodes.head
    assert(props.members == Seq(m("s1"), m("s2"), m("s3")))
    assert(props.exitNode.contains(m("s3")))
  }

  test("chunking splits at Scala models") {
    // s1 -> py -> s2 : py breaks the run; single-node stacks not chunked
    val g = NodeGraph.build(Seq(
      ModelDef("s1", sql),
      ModelDef("py", scalaKind, deps = Seq("s1")),
      ModelDef("s2", sql, deps = Seq("py"))))
    val chunked = Plan.chunked(g)
    assert(chunked.nodes.size == 3)
    assert(chunked.nodes.keySet == Set(m("s1"), m("py"), m("s2")))
  }

  test("chunking merges a pure-SQL diamond (ancestor-subset rule)") {
    //    a -> b ; a -> c ; b,c -> d : all ancestors stay inside the
    // growing chunk, so the whole diamond becomes one chunk in topo
    // order (the reference checks issubset, plan.py:166-171)
    val g = NodeGraph.build(Seq(
      ModelDef("a", sql),
      ModelDef("b", sql, deps = Seq("a")),
      ModelDef("c", sql, deps = Seq("a")),
      ModelDef("d", sql, deps = Seq("b", "c"))))
    val chunked = Plan.chunked(g)
    assert(chunked.nodes.size == 1)
    assert(chunked.nodes.head._2.members ==
      Seq(m("a"), m("b"), m("c"), m("d")))
  }

  test("chunking splits when an ancestor lies outside the chunk") {
    // a(sql) -> b(scala) -> e ; a -> d(sql) -> e(sql): after the scala
    // breaker, d starts a chunk; e's ancestors include b ∉ {a,d} → split
    val g = NodeGraph.build(Seq(
      ModelDef("a", sql),
      ModelDef("b", scalaKind, deps = Seq("a")),
      ModelDef("d", sql, deps = Seq("a")),
      ModelDef("e", sql, deps = Seq("b", "d"))))
    val chunked = Plan.chunked(g)
    // no multi-node chunk forms at all (runs of length 1 stay plain)
    assert(chunked.nodes.keySet == Set(m("a"), m("b"), m("d"), m("e")))
  }

  test("pre-hook splits before, post-hook splits after (plan.py:158-176)") {
    val models = Seq(
      ModelDef("s1", sql), ModelDef("s2", sql, deps = Seq("s1")),
      ModelDef("s3", sql, deps = Seq("s2")))
    val g = NodeGraph.build(models,
      preHooks = Map("s2" -> Seq("p.py")))
    val chunked = Plan.chunked(g)
    // s2 has a pre-hook → breaker; nothing chunks (runs of 1)
    assert(chunked.nodes.size == 3)

    val g2 = NodeGraph.build(models,
      postHooks = Map("s2" -> Seq("p.py")))
    val chunked2 = Plan.chunked(g2)
    // s1+s2 chunk (split after s2's post-hook), s3 alone
    assert(chunked2.nodes.values.map(_.members).toSet
      .contains(Seq(m("s1"), m("s2"))))
  }

  test("filtered graph drops unselected nodes and their edges") {
    val g = NodeGraph.build(Seq(
      ModelDef("a", sql), ModelDef("b", sql, deps = Seq("a")),
      ModelDef("c", sql, deps = Seq("b"))))
    val f = Plan.filtered(g, Set(m("a"), m("c")))
    assert(f.nodes.keySet == Set(m("a"), m("c")))
    assert(f.edgeSet.isEmpty)
  }
}
