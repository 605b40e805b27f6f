package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** At-scale (sf1 tiling) evidence for the bounded-output dedup
  * contracts. The DuckDB oracle pins `dd_simhash_resolve` /
  * `dd_minhash_resolve` exactly at sf0.01 (the driver gate) and sf0.1
  * (stability-audited), and the contraction algorithm itself is pinned
  * against an exhaustive driver-side union-find on random graphs
  * (ConnectedComponentsSpec). What neither covers is the sf1 regime
  * where the simhash graph develops a ~44k-doc giant component: its
  * transitive-closure oracle (~2×10⁹ reach rows) is infeasible for any
  * SQL engine — the quadratic closure is precisely the scale failure
  * the bounded contract exists to avoid — so at sf1 the labeling is
  * checked against its DEFINING properties on the Spark side instead:
  *
  *  - cover: exactly one row per corpus doc, doc_ids unique;
  *  - min-label: every cluster's label is its minimum member id;
  *  - edge consistency: every hamming ≤ 2 pair shares a label (run
  *    over the un-sorted pair stream — the full 40M-pair set).
  *
  * Together with the random-graph equivalence these bound the failure
  * modes: a wrong component split violates edge consistency, a
  * spurious merge violates min-label for the swallowed cluster's
  * members or is the algorithmic case ConnectedComponentsSpec rules
  * out.
  */
class ResolveConsistencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf1 = "testdata/sf1"

  test("sf1 simhash resolve: corpus cover, min labels, edge-consistent") {
    // fresh checkouts materialize the documents tiling on demand, same
    // never-skip discipline as the embeddings fixture
    if (!new java.io.File(s"$sf1/documents.parquet").exists())
      graft.DataGen.tileDocuments(spark, "/root/testdata/sf0.1", sf1, 10)
    val labels = Dedup.ddSimhashResolve(spark, sf1)
      .select("doc_id", "cluster_rep").cache()
    try {
      val n = labels.count()
      assert(n == Dedup.corpus(spark, sf1).count(),
        "one label row per corpus doc")
      assert(labels.select("doc_id").distinct().count() == n)
      val badMin = labels.groupBy("cluster_rep")
        .agg(min("doc_id").as("mn"))
        .filter(col("mn") =!= col("cluster_rep")).count()
      assert(badMin == 0, "cluster_rep must be the min member id")
      // full-pair edge consistency (the sort-free pair stream; the
      // giant component alone contributes tens of millions of pairs)
      val pairs = Dedup.simhashPairs(
        Dedup.simhashSigs(spark, sf1).withColumnRenamed("doc_id", "id"))
      val a = labels.toDF("id_a", "la")
      val b = labels.toDF("id_b", "lb")
      val split = pairs.join(a, "id_a").join(b, "id_b")
        .filter(col("la") =!= col("lb")).count()
      assert(split == 0, s"$split hamming<=2 pairs straddle labels")
    } finally { labels.unpersist(); () }
  }
}
