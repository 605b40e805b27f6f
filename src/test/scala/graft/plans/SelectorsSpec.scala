package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.api.{ModelDef, ModelKind}

/** Ports of the reference's selector tests
  * (`/root/reference/projects/adapter/tests/graph/test_selectors.py:12-251`)
  * over an A→B→C, A→D style fixture graph.
  */
class SelectorsSpec extends AnyFunSuite {

  private def sql = ModelKind.Sql("SELECT 1")
  // A -> B -> C ; A -> D ; E isolated
  private val graph = NodeGraph.build(Seq(
    ModelDef("A", sql),
    ModelDef("B", sql, deps = Seq("A")),
    ModelDef("C", sql, deps = Seq("B")),
    ModelDef("D", sql, deps = Seq("A")),
    ModelDef("E", sql)))
  private def m(n: String) = NodeGraph.modelId(n)
  private val modelTags = Map("B" -> Set("daily"), "D" -> Set("daily"))

  test("plain model selector picks just the model") {
    assert(Selectors.select(graph, Seq("B")) == Set(m("B")))
  }

  test("model+ selects descendants") {
    assert(Selectors.select(graph, Seq("A+")) ==
      Set(m("A"), m("B"), m("C"), m("D")))
  }

  test("+model selects ancestors") {
    assert(Selectors.select(graph, Seq("+C")) ==
      Set(m("A"), m("B"), m("C")))
  }

  test("n+ bounds ancestor depth") {
    assert(Selectors.select(graph, Seq("1+C")) == Set(m("B"), m("C")))
    assert(Selectors.select(graph, Seq("2+C")) ==
      Set(m("A"), m("B"), m("C")))
  }

  test("model+n bounds descendant depth") {
    assert(Selectors.select(graph, Seq("A+1")) ==
      Set(m("A"), m("B"), m("D")))
  }

  test("@model = children with their parents") {
    // @B: B, descendants {C}, plus ancestors of C {A, B}
    assert(Selectors.select(graph, Seq("@B")) ==
      Set(m("A"), m("B"), m("C")))
  }

  test("@ with trailing + is an error (selectors.py:199-203)") {
    intercept[IllegalArgumentException] { Selectors.parse("@B+") }
  }

  test("space is union") {
    assert(Selectors.select(graph, Seq("B D")) == Set(m("B"), m("D")))
  }

  test("comma is intersection") {
    // A+ = {A,B,C,D}; +C = {A,B,C}; intersection drops D
    assert(Selectors.select(graph, Seq("A+,+C")) ==
      Set(m("A"), m("B"), m("C")))
  }

  test("tag selector") {
    assert(Selectors.select(graph, Seq("tag:daily"), modelTags) ==
      Set(m("B"), m("D")))
  }

  test("exclude subtracts") {
    assert(Selectors.plan(graph, Seq("A+"), Seq("C")) ==
      Set(m("A"), m("B"), m("D")))
  }

  test("nonexistent node is ignored, not fatal") {
    assert(Selectors.select(graph, Seq("nope+")).isEmpty)
    assert(Selectors.select(graph, Seq("nope B")) == Set(m("B")))
  }

  test("empty selection means everything") {
    assert(Selectors.select(graph, Nil) == graph.nodes.keySet)
  }

  test("script selector expands by name containment") {
    val g2 = NodeGraph.build(
      Seq(ModelDef("A", sql), ModelDef("B", sql, deps = Seq("A"))),
      Seq(NodeGraph.ScriptAttachment("A", "s.py", before = true),
        NodeGraph.ScriptAttachment("B", "s.py", before = false)))
    assert(Selectors.select(g2, Seq("s.py")) ==
      Set(NodeGraph.beforeScriptId("A", "s.py"),
        NodeGraph.afterScriptId("B", "s.py")))
  }
}
