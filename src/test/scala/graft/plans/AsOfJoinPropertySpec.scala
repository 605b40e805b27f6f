package graft.plans

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized equivalence for the native as-of join: seeded random
  * trades/quotes (small key spaces to force collisions, duplicate left
  * timestamps, unmatched keys on both sides, multi-column keys) checked
  * against a driver-side reference of the same semantics — for every
  * left row, the right row with the greatest time ≤ the left time among
  * equal keys, else null. Right sides are deduplicated to unique
  * (key, time) so the semantics are well-defined (the documented
  * contract, matching DuckDB's ASOF).
  */
class AsOfJoinPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: Int): Timestamp = new Timestamp(s * 1000L)

  test("native as-of join matches a driver-side reference on random data") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 4) {
      val nLeft = 40 + rng.nextInt(120)
      val nRight = 30 + rng.nextInt(100)
      val keySpace = 1 + rng.nextInt(6)
      val left = (1 to nLeft).map(i =>
        (i.toLong, rng.nextInt(keySpace).toLong,
          rng.nextInt(keySpace).toLong, ts(rng.nextInt(50))))
      val right0 = (1 to nRight).map(i =>
        (1000L + i, rng.nextInt(keySpace).toLong,
          rng.nextInt(keySpace).toLong, ts(rng.nextInt(50))))
      // unique (key, time) on the right — the operator's documented
      // determinism contract
      val right = right0.groupBy(r => (r._2, r._3, r._4))
        .values.map(_.minBy(_._1)).toSeq

      val expected = left.map { case (id, k1, k2, t) =>
        val m = right.filter(r => r._2 == k1 && r._3 == k2 &&
          !r._4.after(t))
        id -> (if (m.isEmpty) -1L else m.maxBy(_._4.getTime)._1)
      }.toMap

      val lDf = left.toDF("id", "k1", "k2", "ts")
      val rDf = right.toDF("rid", "k1", "k2", "rts")
      val got = AsOf.join(lDf, rDf, Seq("k1", "k2"), "ts", "rts")
        .select("id", "rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L
          else r.getLong(1))).toMap
      assert(got == expected, s"trial=$trial nLeft=$nLeft " +
        s"nRight=${right.size} keySpace=$keySpace")
    }
  }

  test("empty right side leaves every left row unmatched") {
    import spark.implicits._
    val l = Seq((1L, 1L, ts(1)), (2L, 2L, ts(2))).toDF("id", "k", "ts")
    val r = Seq.empty[(Long, Long, Timestamp)].toDF("rid", "k", "rts")
    val rows = AsOf.join(l, r, Seq("k"), "ts", "rts")
      .select("id", "rid").collect()
    assert(rows.length == 2 && rows.forall(_.isNullAt(1)))
  }
}
