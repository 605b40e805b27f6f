package graft

import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing (builder guidance: "bucketing for
  * co-located joins"): two tables bucketed on the join key join with NO
  * shuffle exchange — the plan property that makes repeated big-fact
  * joins linear at 100 TB (pay the shuffle once at write time).
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("join of co-bucketed tables plans without a shuffle exchange") {
    import spark.implicits._
    // force sort-merge so the exchange question is about partitioning,
    // not broadcast (BroadcastExchange would confuse the assertion)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    try {

    (1L to 1000L).map(i => (i, s"o$i")).toDF("key", "o")
      .write.bucketBy(8, "key").sortBy("key").saveAsTable("b_orders")
    (1L to 5000L).map(i => (i % 1000 + 1, s"l$i")).toDF("key", "l")
      .write.bucketBy(8, "key").sortBy("key").saveAsTable("b_lines")

    val joined = spark.table("b_orders").join(spark.table("b_lines"), "key")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join should not shuffle, plan was:\n$plan")
    assert(joined.count() == 5000)

    // control: the same join over unbucketed data DOES shuffle
    val plain = (1L to 1000L).map(i => (i, s"o$i")).toDF("key", "o")
      .join((1L to 5000L).map(i => (i % 1000 + 1, s"l$i")).toDF("key", "l"),
        "key")
    assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lines")
    }
  }
}
