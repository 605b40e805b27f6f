package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantic gates for the benchmark-decontamination pair
  * ([[Dedup.ddContamination]] exact-shingle, fuzzy MinHash-LSH
  * [[Dedup.ddFuzzyDecontamination]]).
  *
  * The DuckDB oracle pins both bitwise; what it cannot say is whether
  * the fuzzy check FINDS the leak the exact check models. sf0.001
  * plants one cross-source near-dup (train doc 229 vs eval doc 263,
  * true shingle-Jaccard 0.95) — the fuzzy pass must flag it, must flag
  * only train-side docs, and must keep the corpus-sized sides out of
  * every shuffle join (the 100 TB posture: eval bands, candidates and
  * eval signatures broadcast; the train side is probed map-only).
  */
class DecontaminationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // NOT cached: the plan-shape test below must see the join plan, and
  // a cache() would substitute an InMemoryTableScan for it
  private def fuzzy = Dedup.ddFuzzyDecontamination(spark, dir)

  test("fuzzy decontamination flags the planted cross-source near-dup") {
    val hit = fuzzy.filter(col("train_id") === 229L).collect()
    assert(hit.length === 1, "train doc 229 (true J=0.95 vs eval 263) " +
      "must be flagged")
    val r = hit.head
    assert(r.getLong(r.fieldIndex("n_eval_docs")) >= 1L)
    // 16-perm estimate of a 0.95-Jaccard pair: well above the gate
    assert(r.getDouble(r.fieldIndex("max_est_jaccard")) >= 0.75)
  }

  test("output is train-side only and respects the 0.5 estimate gate") {
    val srcs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("train_id"), col("source"))
    val joined = fuzzy.join(srcs, "train_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getString(r.fieldIndex("source")) != "src3",
        s"doc ${r.getLong(0)} with source src3 leaked into the " +
          "train-side report")
      assert(r.getDouble(r.fieldIndex("max_est_jaccard")) >= 0.5)
    }
  }

  test("the eval-suite signature slice derives once per (session, corpus)") {
    // the streaming ingest gate calls this per micro-batch; without the
    // memo each trigger would rescan the corpus-sized signature model
    val a = Dedup.evalSuiteSigs(spark, dir)
    assert(a eq Dedup.evalSuiteSigs(spark, dir),
      "memo must hand back the same cached frame")
  }

  test("corpus-sized sides never shuffle: eval bands/sigs and candidates broadcast") {
    val plan = fuzzy.queryExecution.executedPlan.toString
    // the only SortMergeJoin-eligible join is the doc_id tag join, and
    // both of its sides read doc_id-bucketed standing models — assert
    // the probe joins all broadcast
    val smj = "SortMergeJoin".r.findAllIn(plan).length
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(bhj >= 3, s"expected eval-band + candidate + eval-sig " +
      s"broadcast joins, got $bhj in:\n$plan")
    assert(smj <= 1, s"corpus-sized shuffle join crept in ($smj " +
      s"SortMergeJoins):\n$plan")
  }
}
