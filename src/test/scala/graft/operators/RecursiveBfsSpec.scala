package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The iterative frontier expansion behind q_recursive_bfs, checked
  * against a driver-side textbook BFS over the same (collected) edge
  * set — min-distance semantics, depth bound, and bipartite decoding.
  */
class RecursiveBfsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("frontier BFS equals driver-side BFS at sf0.001") {
    val li = graft.Tables.load(spark, dir, "lineitem")
      .select("l_suppkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0) * 2, r.getLong(1) * 2 + 1))
    val adj = (li ++ li.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    val seeds = graft.Tables.load(spark, dir, "supplier")
      .select("s_suppkey").collect().map(_.getLong(0))
      .filter(_ <= 3).map(_ * 2)
    // textbook BFS, depth <= 3
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds.toSet
    for (d <- 1 to 3) {
      val next = frontier.flatMap(adj.getOrElse(_, Set.empty[Long]))
        .diff(dist.keySet)
      dist ++= next.map(_ -> d.toLong)
      frontier = next
    }
    val expected = dist.map { case (node, d) =>
      (if (node % 2 == 0) "supplier" else "part", node / 2, d)
    }.toSet

    val got = Relational6.qRecursiveBfs(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == expected)
    // distances partition by node kind on a bipartite graph: suppliers
    // at even distance, parts at odd
    assert(got.forall { case (kind, _, d) =>
      (kind == "supplier") == (d % 2 == 0)
    })
  }
}
