package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Fuzzes the two-phase (bucketed) gap detector behind q_gaps against a
  * driver-side scan: random key sets, bucket sizes chosen to force
  * gaps inside buckets, across bucket boundaries, and spanning whole
  * empty buckets.
  */
class GapRunsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def referenceGaps(keys: Seq[Long]): Seq[(Long, Long, Long)] = {
    val s = keys.distinct.sorted
    s.zip(s.drop(1)).collect {
      case (a, b) if b - a > 1 => (a + 1, b - 1, b - a - 1)
    }
  }

  test("bucketed gap runs equal the driver-side scan on random key sets") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    for {
      density <- Seq(0.9, 0.5, 0.1, 0.02) // 0.02 leaves whole buckets empty
      bucket <- Seq(3L, 16L, 100L)
    } {
      val keys = (0L until 600L).filter(_ => rng.nextDouble() < density)
      whenever(keys.size >= 2) {
        val got = Relational6
          .gapRuns(keys.toDF("k"), bucket)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSeq
        assert(got == referenceGaps(keys),
          s"density=$density bucket=$bucket")
      }
    }
  }

  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  test("dense keys produce no gaps; a single key produces none") {
    import spark.implicits._
    assert(Relational6.gapRuns((10L to 20L).toDF("k"), 4L).count() == 0)
    assert(Relational6.gapRuns(Seq(42L).toDF("k"), 4L).count() == 0)
  }
}
