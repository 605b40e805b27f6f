package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The native as-of join: semantics (latest right row at or before each
  * left row per key, left outer), plan shape (AsOfJoinExec, no window,
  * no cartesian), and equivalence with the composed window formulation.
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("matches each left row to the latest right row at or before it") {
    import spark.implicits._
    val trades = Seq((1L, 10L, ts(5)), (2L, 10L, ts(20)), (3L, 20L, ts(7)),
      (4L, 30L, ts(9))).toDF("trade_id", "acct", "ts")
    val quotes = Seq((100L, 10L, ts(4)), (101L, 10L, ts(5)),
      (102L, 10L, ts(12)), (103L, 20L, ts(30)))
      .toDF("quote_id", "q_acct", "q_ts")
    val out = AsOf.join(trades,
      quotes.withColumnRenamed("q_acct", "acct"), Seq("acct"), "ts", "q_ts")
    val rows = out.select("trade_id", "quote_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(rows == Map(
      1L -> 101L, // ts(5): quote at exactly ts(5) wins over ts(4)
      2L -> 102L, // ts(20): latest at ts(12)
      3L -> -1L, // acct 20's only quote is later (ts(30)) → null
      4L -> -1L)) // acct 30 has no quotes → null
  }

  test("plans as AsOfJoinExec with no window or cartesian operators") {
    import spark.implicits._
    val l = Seq((1L, 1L, ts(1))).toDF("id", "k", "ts")
    val r = Seq((2L, 1L, ts(0))).toDF("rid", "k", "rts")
    val plan = AsOf.join(l, r, Seq("k"), "ts", "rts")
      .queryExecution.executedPlan.toString
    // the physical node prints without the Exec suffix
    assert(plan.contains("AsOfJoin "), plan)
    assert(!plan.contains("Window") && !plan.contains("Cartesian"), plan)
  }

  test("agrees with the composed window formulation on the events table") {
    val dir = "/root/testdata/sf0.001"
    val composed = graft.operators.Joins2.qAsofJoin(spark, dir)
      .select(col("purchase_id"), col("last_click_id"))
    val ev = graft.Tables.load(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts"))
    // strictly-before semantics of the composed form: shift the right
    // side by excluding same-instant rows via (ts, event_id) tie-break.
    // The native operator is at-or-before, so feed it clicks keyed the
    // same way and compare only where no same-timestamp click exists
    // (on this fixture click/purchase timestamps never collide, so the
    // two semantics coincide).
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id"), col("ts").as("click_ts"))
    val native = AsOf.join(purchases, clicks, Seq("user_id"),
      "ts", "click_ts")
      .select(col("purchase_id"), col("click_id"))
    val c = composed.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val n = native.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(c == n)
  }

  test("collects directly without a parent projection (UnsafeRow output)") {
    import spark.implicits._
    val l = Seq((1L, 10L, ts(5)), (2L, 20L, ts(6))).toDF("id", "k", "ts")
    val r = Seq((7L, 10L, ts(1))).toDF("rid", "rk", "rts")
    // bare collect() hits getByteArrayRdd, which consumes UnsafeRow —
    // the operator must emit through a result projection (ADVICE r2)
    val rows = AsOf.join(l, r.withColumnRenamed("rk", "k"),
      Seq("k"), "ts", "rts").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("null join keys never match (SQL equi-join semantics)") {
    import spark.implicits._
    val l = Seq((1L, Some(10L), ts(5)), (2L, None, ts(6)))
      .toDF("id", "k", "ts")
    val r = Seq((7L, Some(10L), ts(1)), (8L, None, ts(1)))
      .toDF("rid", "k2", "rts")
    val out = AsOf.join(l, r.withColumnRenamed("k2", "k"),
      Seq("k"), "ts", "rts")
      .select("id", "rid").collect()
      .map(r0 => r0.getLong(0) -> (if (r0.isNullAt(1)) -1L
        else r0.getLong(1))).toMap
    // id=1 (k=10) matches rid=7; id=2 (k=null) matches nothing — and
    // the null-keyed right row (rid=8) is never emitted as a match
    assert(out == Map(1L -> 7L, 2L -> -1L))
  }

  test("rejects mismatched key or time types up front") {
    import spark.implicits._
    val l = Seq((1L, 10L, ts(5))).toDF("id", "k", "ts")
    val rStrKey = Seq(("a", "10", ts(1))).toDF("rid", "k", "rts")
    val e1 = intercept[IllegalArgumentException] {
      AsOf.join(l, rStrKey, Seq("k"), "ts", "rts")
    }
    assert(e1.getMessage.contains("key type mismatch"))
    val rLongTime = Seq((7L, 10L, 99L)).toDF("rid", "k", "rts")
    val e2 = intercept[IllegalArgumentException] {
      AsOf.join(l, rLongTime, Seq("k"), "ts", "rts")
    }
    assert(e2.getMessage.contains("time type mismatch"))
  }
}
