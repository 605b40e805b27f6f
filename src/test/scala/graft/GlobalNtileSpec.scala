package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.withGlobalNtile

/** The distributed two-phase ntile must be bit-identical to the
  * single-partition `ntile(k) OVER (ORDER BY …)` it replaces —
  * including the uneven-bucket boundaries (first N mod k buckets get
  * the extra row) and N < k (bucket = rank). Sizes straddle the
  * test session's 4 shuffle partitions so ranks genuinely cross
  * range-partition boundaries.
  */
class GlobalNtileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(n: Int, k: Int): Unit = {
    import spark.implicits._
    // non-monotone key with duplicates; id is the unique tie-break
    val df = (0 until n)
      .map(i => (i.toLong, (i * 2654435761L % 97L).toLong))
      .toDF("id", "score")
    val expected = df.withColumn("bucket",
      ntile(k).over(Window.orderBy(col("score"), col("id")))
        .cast("long"))
    val actual = withGlobalNtile(df, k, "bucket",
      col("score"), col("id"))
    assert(actual.select("id", "score", "bucket")
      .except(expected.select("id", "score", "bucket")).count() === 0L
      && actual.count() === n.toLong,
      s"mismatch at n=$n k=$k")
  }

  test("matches ntile across uneven buckets, N < k, and desc order") {
    for ((n, k) <- Seq((1, 3), (2, 3), (7, 3), (100, 4), (101, 4),
        (103, 7))) check(n, k)
  }

  test("matches ntile under a descending order key") {
    import spark.implicits._
    val df = (0 until 53)
      .map(i => (i.toLong, (i * 48271L % 31L).toLong))
      .toDF("id", "score")
    val expected = df.withColumn("bucket",
      ntile(4).over(Window.orderBy(col("score").desc, col("id")))
        .cast("long"))
    val actual = withGlobalNtile(df, 4, "bucket",
      col("score").desc, col("id"))
    assert(actual.select("id", "bucket")
      .except(expected.select("id", "bucket")).count() === 0L)
  }
}
