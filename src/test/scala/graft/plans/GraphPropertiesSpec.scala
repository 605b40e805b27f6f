package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import scala.collection.immutable.SortedMap
import scala.util.Random

/** Property-style checks over seeded random DAGs — coverage the
  * reference's example-based suite never had: structural invariants of
  * the graph ops and the selector algebra hold for arbitrary shapes.
  * (Plain seeded sampling instead of ScalaCheck: deterministic, and the
  * offline build carries no scalatestplus bridge.)
  */
class GraphPropertiesSpec extends AnyFunSuite {

  /** Random DAG: nodes n00..n(k-1), edges only low→high index. */
  private def randomDag(rnd: Random): Digraph = {
    val n = 2 + rnd.nextInt(11)
    val edges = (0 until rnd.nextInt(2 * n)).map { _ =>
      val a = rnd.nextInt(n - 1)
      val b = a + 1 + rnd.nextInt(n - a - 1)
      (f"n$a%02d", f"n$b%02d")
    }.distinct
    Digraph(
      SortedMap((0 until n).map(i =>
        f"n$i%02d" -> NodeProps(NodeKind.DbtModel)): _*).toSeq,
      edges)
  }

  private def forAllDags(trials: Int = 200)(check: Digraph => Unit): Unit = {
    val rnd = new Random(42)
    (1 to trials).foreach(_ => check(randomDag(rnd)))
  }

  test("topological sort respects every edge") {
    forAllDags() { g =>
      val order = g.topologicalSort.zipWithIndex.toMap
      g.edgeSet.foreach { case (a, b) => assert(order(a) < order(b)) }
      assert(order.size == g.nodes.size)
    }
  }

  test("ancestors and descendants are symmetric") {
    forAllDags() { g =>
      g.nodes.keys.foreach { n =>
        g.descendants(n).foreach(d => assert(g.ancestors(d).contains(n)))
        g.ancestors(n).foreach(a => assert(g.descendants(a).contains(n)))
      }
    }
  }

  test("bounded traversal is monotone in depth and converges") {
    forAllDags(100) { g =>
      g.nodes.keys.foreach { n =>
        assert(g.successorsWithin(n, 1).subsetOf(g.successorsWithin(n, 2)))
        assert(g.successorsWithin(n, g.nodes.size) == g.descendants(n))
        assert(g.predecessorsWithin(n, g.nodes.size) == g.ancestors(n))
      }
    }
  }

  test("@node equals node + descendants + their ancestors") {
    forAllDags(100) { g =>
      val idMap = g.nodes.keys.map(n => n -> NodeGraph.modelId(n)).toMap
      val mg = Digraph(
        g.nodes.toSeq.map { case (n, p) => idMap(n) -> p },
        g.edgeSet.toSeq.map { case (a, b) => idMap(a) -> idMap(b) })
      g.nodes.keys.foreach { n =>
        val got = Selectors.select(mg, Seq(s"@$n"))
        val ds = mg.descendants(idMap(n))
        val expected = ds.foldLeft(ds + idMap(n))((acc, d) =>
          acc ++ mg.ancestors(d))
        assert(got == expected, s"@$n mismatch")
      }
    }
  }

  test("chunking preserves the node universe and stays acyclic") {
    forAllDags() { g =>
      val chunked = Plan.chunked(g)
      val expanded = chunked.nodes.flatMap { case (id, props) =>
        if (props.members.nonEmpty) props.members else Seq(id)
      }.toSet
      assert(expanded == g.nodes.keySet.toSet)
      chunked.topologicalSort // throws on cycle
      ()
    }
  }

  test("selection is monotone: adding a selector never shrinks the set") {
    forAllDags(100) { g =>
      val idMap = g.nodes.keys.map(n => n -> NodeGraph.modelId(n)).toMap
      val mg = Digraph(
        g.nodes.toSeq.map { case (n, p) => idMap(n) -> p },
        g.edgeSet.toSeq.map { case (a, b) => idMap(a) -> idMap(b) })
      val names = g.nodes.keys.toSeq
      val one = Selectors.select(mg, Seq(names.head))
      val two = Selectors.select(mg, Seq(s"${names.head} ${names.last}"))
      assert(one.subsetOf(two))
    }
  }
}
