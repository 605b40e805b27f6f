package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executes EVERY `SparkEntry.queries` entry on sf0.001 and asserts it
  * runs (no analysis/runtime throw). This is the in-repo guard the
  * round-6 postmortem called for: when the driver regenerates
  * `/root/testdata` with a new encoding, the breakage fails `sbt test`
  * within minutes instead of silently shrinking the correctness file
  * (r6 lost 21 oracle rows that way). One test per query so a failure
  * names the query directly.
  */
class SmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"smoke: $name executes on sf0.001") {
      val n = fn(spark, dir).count()
      assert(n >= 0)
      spark.sharedState.cacheManager.clearCache()
    }
  }
}
