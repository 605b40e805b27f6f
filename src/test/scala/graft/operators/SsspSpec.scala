package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The 4-round weighted relaxation behind q_sssp, checked against a
  * driver-side textbook Bellman-Ford over the same (collected)
  * weighted edge set — an INDEPENDENT formulation, so a shared
  * Spark/oracle mistake (both are unrolled min-plus dataflows authored
  * together) cannot stay green here: this reference relaxes edge by
  * edge per round, derives weights with plain Scala math, and bounds
  * hops explicitly.
  */
class SsspSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("hop-bounded Bellman-Ford equals driver-side reference at " +
      "sf0.001") {
    val li = graft.Tables.load(spark, dir, "lineitem")
      .select("l_suppkey", "l_partkey", "l_quantity")
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        math.floor(r.getDouble(2)).toLong))
    // min-quantity weight per undirected supplier↔part pair
    val w = li.groupBy(_._1).map { case ((s, p), vs) =>
      (s * 2, p * 2 + 1) -> vs.map(_._2).min
    }
    val arcs = (w ++ w.map { case ((u, v), c) => (v, u) -> c }).toSeq
    val seeds = graft.Tables.load(spark, dir, "supplier")
      .select("s_suppkey").collect().map(_.getLong(0))
      .filter(_ <= 3).map(_ * 2)
    // textbook Bellman-Ford: dist_{k+1}(v) = min(dist_k(v),
    // min over arcs (u,v) of dist_k(u) + w) — exactly 4 rounds
    var dist = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to 4) {
      val relaxed = arcs.flatMap { case ((u, v), c) =>
        dist.get(u).map(du => v -> (du + c))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (n, ds) => n -> ds.map(_._2).min }
    }
    val expected = dist.map { case (node, d) =>
      (if (node % 2 == 0) "supplier" else "part", node / 2, d)
    }.toSet

    val got = Graph.qSssp(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == expected)
    // sanity on the fixture: the weighted relaxation must genuinely
    // route around expensive direct edges somewhere, or the test
    // degenerates to weighted-BFS (same frontier order)
    assert(expected.exists { case (_, _, d) => d > 0 },
      "fixture must produce non-trivial path costs")
    val seedsSet = seeds.map(_ / 2).toSet
    assert(expected.count { case (kind, key, d) =>
      kind == "supplier" && seedsSet(key) && d == 0L } == seeds.length,
      "every seed supplier must sit at distance 0")
  }
}
