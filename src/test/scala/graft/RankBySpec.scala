package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.withRankBy

/** The window-free per-key rank must agree with
  * `row_number() OVER (PARTITION BY key ORDER BY value)` — exactly on
  * unique values, and value-at-rank (the property medians consume) in
  * the presence of ties. Sizes straddle the 4 test shuffle partitions
  * so keys genuinely span range-partition boundaries.
  */
class RankBySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("matches keyed row_number on unique values") {
    import spark.implicits._
    val df = (0 until 211)
      .map(i => (s"k${i % 5}", (i * 2654435761L % 99991L).toLong))
      .toDF("key", "v")
    val expected = df.withColumn("rn", row_number().over(
        Window.partitionBy("key").orderBy("v")).cast("long"))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy("key")).cast("long"))
    val actual = withRankBy(df, "key", "v", "rn", "n")
    assert(actual.select("key", "v", "rn", "n")
      .except(expected.select("key", "v", "rn", "n")).count() === 0L
      && actual.count() === 211L)
  }

  test("value-at-rank is deterministic under ties") {
    import spark.implicits._
    val df = (0 until 120)
      .map(i => (s"k${i % 3}", (i % 7).toLong)) // heavy ties
      .toDF("key", "v")
    val actual = withRankBy(df, "key", "v", "rn", "n")
      .select("key", "rn", "v")
    val expected = df.withColumn("rn", row_number().over(
        Window.partitionBy("key").orderBy("v")).cast("long"))
      .select("key", "rn", "v")
    // ranks may be assigned differently among tied rows, but the value
    // carried by each (key, rank) must be identical
    assert(actual.except(expected).count() === 0L)
    assert(actual.groupBy("key", "rn").count()
      .filter(col("count") > 1).count() === 0L, "ranks not unique")
  }
}
