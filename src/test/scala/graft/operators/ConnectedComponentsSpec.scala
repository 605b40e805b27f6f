package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property coverage for the hierarchical union-find contraction behind
  * dd_cluster: random graphs, several partitionings, and a tiny
  * final-level bound that forces the multi-level loop (which never runs
  * at test corpus sizes otherwise). Reference answer: a driver-side
  * union-find over the same edges.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def referenceComponents(
      edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keys.map(n => n -> find(n)).toMap
  }

  test("contraction labels equal driver union-find on random graphs") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    for {
      nNodes <- Seq(30, 200)
      nEdges <- Seq(10, 150)
      parts <- Seq(1, 3, 7)
    } {
      val edges = Seq.fill(nEdges)(
        (rng.nextInt(nNodes).toLong, rng.nextInt(nNodes).toLong))
      val expected = referenceComponents(edges)
      // trigger 4 forces several contraction levels; the default
      // (single-level) path is exercised by the dd_cluster oracle
      val got = Dedup.connectedComponents(
        edges.toDS().repartition(parts), contractAbove = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected,
        s"nodes=$nNodes edges=$nEdges parts=$parts")
    }
  }

  test("oversized final edge set fails cleanly, not via one-task OOM") {
    // VERDICT r8 #6: a giant component is irreducible (k nodes contract
    // to k star edges, never fewer), so when the contracted set still
    // exceeds the single-task cap after the level cap, the operator
    // must error with an actionable message instead of coalescing an
    // unbounded edge list into one task.
    import spark.implicits._
    val chain = (0L until 40L).map(i => (i, i + 1)) // one 41-node component
    val ex = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(chain.toDS().repartition(4),
        singleTaskEdges = 8).collect()
    }
    assert(ex.getMessage.contains("singleTaskEdges"))
    // the same graph under the default cap resolves fine
    val ok = Dedup.connectedComponents(chain.toDS().repartition(4))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok.values.toSet == Set(0L) && ok.size == 41)
  }

  test("self-loops and duplicate edges are harmless") {
    import spark.implicits._
    val edges = Seq((1L, 1L), (1L, 2L), (1L, 2L), (2L, 1L), (5L, 5L))
    val got = Dedup.connectedComponents(edges.toDS().repartition(2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 5L))
  }
}
