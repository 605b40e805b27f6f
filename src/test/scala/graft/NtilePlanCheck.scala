package graft

import org.scalatest.funsuite.AnyFunSuite

/** The distributed ntile must shuffle the data exactly once per pass
  * (the range partitioning): no WindowExec, no second exchange of the
  * frame. Guards the monotonically_increasing_id ordinal idiom.
  */
class NtilePlanCheck extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("withGlobalNtile plans one data exchange and no window") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, (i * 7L) % 13L))
      .toDF("id", "score")
    val out = graft.operators.withGlobalNtile(df, 4, "b",
      org.apache.spark.sql.functions.col("score"),
      org.apache.spark.sql.functions.col("id"))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"unexpected window:\n$p")
    // rangepartitioning appears once for the frame; the only other
    // exchanges aggregate the P-row count table
    val rangeExchanges = "rangepartitioning".r.findAllIn(p.toLowerCase).size
    assert(rangeExchanges >= 1, s"expected a range exchange:\n$p")
  }
}
