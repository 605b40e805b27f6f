package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.StreamOps._

/** Streaming semantics checks via MemoryStream micro-batches, including
  * batch/stream equivalence of the windowing expressions (the unified
  * API contract the batch oracle checks rely on).
  */
class StreamOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  private val fixture = Seq(
    Event(1, ts(1), 10, "click", 1.0),
    Event(2, ts(2), 10, "click", 2.0),
    Event(3, ts(12), 10, "view", 3.0),
    Event(4, ts(3), 20, "click", 4.0),
    Event(5, ts(50), 20, "view", 5.0))

  test("tumbling counts: streaming result equals batch result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(fixture)
    val q = tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("tumbling_test")
        .orderBy("window_start", "event_type")
        .collect().map(r => (r.getTimestamp(0), r.getString(1),
          r.getLong(2), r.getDouble(3))).toSeq
      val batch = tumblingCounts(fixture.toDF())
        .orderBy("window_start", "event_type")
        .collect().map(r => (r.getTimestamp(0), r.getString(1),
          r.getLong(2), r.getDouble(3))).toSeq
      assert(streamed == batch)
      // window 0: clicks from both users aggregate; windows 10 and 50: views
      assert(streamed.size == 3)
      assert(streamed.head == ((ts(0), "click", 3L, 7.0)))
    } finally q.stop()
  }

  test("session windows split on the 30 min gap") {
    import spark.implicits._
    val out = sessionized(fixture.toDF())
      .filter($"user_id" === 20)
      .orderBy("session_start")
      .collect()
    assert(out.length == 2) // minute 3 and minute 50 are separate sessions
    assert(out.map(_.getLong(3)).toSeq == Seq(1L, 1L))
  }

  test("dedup within watermark drops replayed event ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(fixture)
    input.addData(fixture.take(2)) // replay
    val q = dedupedByEventId(input.toDF())
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup_test").count() == fixture.size)
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running totals across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = runningUserTotals(input.toDS())
      .writeStream.format("memory").queryName("state_test")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(fixture.take(3)) // user 10: 3 events
      q.processAllAvailable()
      input.addData(fixture.drop(3)) // user 20: 2 events
      q.processAllAvailable()
      val byUser = spark.table("state_test")
        .orderBy($"user_id", $"n_events".desc).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.head).toMap
      assert(byUser(10L).getLong(1) == 3)
      assert(byUser(20L).getLong(1) == 2)
      assert(byUser(20L).getDouble(2) == 9.0)
    } finally q.stop()
  }

  test("flatMapGroupsWithState closes sessions as the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = closedSessions(input.toDS(), gapMs = 60000L)
      .writeStream.format("memory").queryName("close_test")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Event(1, ts(1), 10, "click", 1.0),
        Event(2, ts(2), 10, "click", 2.5))
      q.processAllAvailable()
      // watermark hasn't passed ts(2)+60s yet: session 10 still live
      assert(spark.table("close_test").count() == 0)
      // event at ts(9) advances the watermark to 00:08:50 > 00:03:00 —
      // session 10's timer fires on the following batch
      input.addData(Event(3, ts(9), 20, "view", 7.0))
      q.processAllAvailable()
      input.addData(Event(4, ts(30), 30, "view", 0.0))
      q.processAllAvailable()
      // watermark now 00:29:50 > 00:10:00: session 20 fires next batch
      input.addData(Event(5, ts(55), 40, "view", 0.0))
      q.processAllAvailable()
      val closed = spark.table("close_test")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      assert(closed.get(10L).contains((2L, 3.5)))
      assert(closed.get(20L).contains((1L, 7.0)))
      assert(!closed.contains(40L)) // newest session still open
    } finally q.stop()
  }

  test("stream-stream join pairs clicks with in-range impressions only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val imps = MemoryStream[Event]
    val q = clickImpressionJoin(clicks.toDF(), imps.toDF())
      .writeStream.format("memory").queryName("ssjoin_test")
      .outputMode(OutputMode.Append()).start()
    try {
      imps.addData(Event(100, ts(5), 10, "imp", 0.5),
        Event(101, ts(40), 20, "imp", 0.7))
      clicks.addData(
        Event(1, ts(10), 10, "click", 1.0), // 5 min after imp 100 → joins
        Event(2, ts(45), 10, "click", 1.0), // user 10, 40 min gap → no
        Event(3, ts(45), 20, "click", 1.0)) // 5 min after imp 101 → joins
      q.processAllAvailable()
      val rows = spark.table("ssjoin_test")
        .select("click_id", "imp_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((1L, 100L), (3L, 101L)))
    } finally q.stop()
  }

  test("file-sink pipeline dedups exactly-once across a restart") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_fs")
    val (src, sink, chk) = (s"$base/src", s"$base/sink", s"$base/chk")
    val schema = Seq.empty[Event].toDS().schema
    def arrive(events: Event*): Unit =
      events.toDS().write.mode("append").parquet(src)
    def sinkIds(): Set[Long] =
      spark.read.schema(schema).parquet(sink)
        .select("event_id").collect().map(_.getLong(0)).toSet

    arrive(Event(1, ts(1), 10, "click", 1.0),
      Event(2, ts(2), 10, "click", 2.0),
      Event(1, ts(3), 10, "click", 1.0)) // duplicate id 1
    val q1 = fileSinkPipeline(spark, src, sink, chk, schema)
    try {
      q1.processAllAvailable()
      assert(sinkIds() == Set(1L, 2L))
      arrive(Event(2, ts(4), 20, "view", 3.0), // dup id 2, new batch
        Event(3, ts(5), 20, "view", 4.0))
      q1.processAllAvailable()
      assert(sinkIds() == Set(1L, 2L, 3L))
    } finally q1.stop()

    // restart from the checkpoint: state (seen ids) survives, output
    // files already committed are not re-emitted
    val q2 = fileSinkPipeline(spark, src, sink, chk, schema)
    try {
      arrive(Event(3, ts(6), 30, "view", 5.0), // dup across restart
        Event(4, ts(7), 30, "view", 6.0))
      q2.processAllAvailable()
      assert(sinkIds() == Set(1L, 2L, 3L, 4L))
      // exactly-once: each id appears exactly one time in the sink
      val counts = spark.read.schema(schema).parquet(sink)
        .groupBy("event_id").count().collect()
      assert(counts.forall(_.getLong(1) == 1L))
    } finally q2.stop()
  }
}
