package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{withLaggedRunningSums, withRunningSums}

/** The window-free per-key running sum must agree with
  * `sum(x) OVER (PARTITION BY key ORDER BY value ROWS UNBOUNDED
  * PRECEDING)` on unique orderings. Sizes straddle the 4 test shuffle
  * partitions so keys span range-partition boundaries and the
  * broadcast sum-offsets genuinely apply.
  */
class RunningSumsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("matches keyed running sums and ranks on a unique order") {
    import spark.implicits._
    val df = (0 until 307)
      .map(i => (s"k${i % 5}", (i * 2654435761L % 99991L).toLong))
      .toDF("key", "v")
      .withColumn("d", col("v").cast("decimal(28,4)"))
    val w = Window.partitionBy("key").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df
      .withColumn("rn", row_number().over(
        Window.partitionBy("key").orderBy("v")).cast("long"))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy("key")).cast("long"))
      .withColumn("S", sum(col("d")).over(w))
    val actual = withRunningSums(df, "key", "v", "rn", "n",
      Seq("S" -> "d"))
    assert(actual.select("key", "v", "rn", "n", "S")
      .except(expected.select("key", "v", "rn", "n", "S")).count() === 0L
      && actual.count() === 307L)
  }

  test("carries several sums at once, including negatives") {
    import spark.implicits._
    val df = (0 until 150)
      .map { i =>
        val v = (i * 48271L % 10007L).toLong
        (s"k${i % 3}", v, v - 5000L)
      }
      .toDF("key", "v", "x")
      .withColumn("d1", col("v").cast("decimal(28,4)"))
      .withColumn("d2", col("x").cast("decimal(28,4)"))
    val w = Window.partitionBy("key").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df
      .withColumn("S1", sum(col("d1")).over(w))
      .withColumn("S2", sum(col("d2")).over(w))
      .select("key", "v", "S1", "S2")
    val actual = withRunningSums(df, "key", "v", "rn", "n",
      Seq("S1" -> "d1", "S2" -> "d2"))
      .select("key", "v", "S1", "S2")
    assert(actual.except(expected).count() === 0L)
  }

  test("lagged prefixes match window lag across partition boundaries") {
    import spark.implicits._
    // enough rows per key that lag targets land both in-partition and
    // across the 4 test range partitions (the broadcast boundary path)
    val df = (0 until 523)
      .map(i => (s"k${i % 3}", (i * 2654435761L % 99991L).toLong))
      .toDF("key", "v")
      .withColumn("d", col("v").cast("decimal(28,4)"))
    for (off <- Seq(1, 7, 51)) {
      val w = Window.partitionBy("key").orderBy("v")
      val expected = df
        .withColumn("S", sum(col("d")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("S_lag", lag(col("S"), off).over(w))
        .select("key", "v", "S", "S_lag")
      val actual = withLaggedRunningSums(df, "key", "v", "rn", "n",
        Seq("S" -> "d"), off)
        .select("key", "v", "S", "S_lag")
      assert(actual.except(expected).count() === 0L &&
        expected.except(actual).count() === 0L,
        s"lagged running sums diverge from window lag at offset $off")
    }
  }
}
