package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.api.{FalApi, Registry, RunLedger}

/** Streaming ingest into the model store: micro-batches append
  * metadata-only (one increment-sized version per batch, prior files
  * untouched), reads see the whole chain, and batch-id replays are
  * idempotent (the foreachBatch exactly-once recipe).
  */
class StreamIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshApi(): FalApi = new FalApi(spark,
    new Registry(Files.createTempDirectory("graft-ingest").toString),
    new RunLedger)

  test("micro-batches append as chain versions; replayed batch ids are no-ops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val api = freshApi()
    val input = MemoryStream[Long]
    val q = StreamIngest.toModel(input.toDF().withColumnRenamed("value", "x"),
      api, "ingested",
      Files.createTempDirectory("graft-ingest-ckpt").toString)
    try {
      input.addData(1L, 2L)
      q.processAllAvailable()
      val v1 = api.registry.currentPath("ingested").get
      input.addData(3L)
      q.processAllAvailable()
      val v2 = api.registry.currentPath("ingested").get
      assert(v2 != v1)
      // second batch chained onto the first: increment-only version
      assert(Files.exists(Paths.get(v2, "_prev_version")))
      assert(api.ref("ingested").orderBy("x")
        .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()

    // restart replay: an already-committed batch id must be a no-op
    val before = api.registry.currentPath("ingested").get
    import spark.implicits._
    assert(!StreamIngest.applyBatch(api, "ingested",
      Seq(99L).toDF("x"), batchId = 1L))
    assert(api.registry.currentPath("ingested").contains(before))
    assert(api.ref("ingested").count() == 3)
    // a genuinely new batch id applies
    assert(StreamIngest.applyBatch(api, "ingested",
      Seq(4L).toDF("x"), batchId = 2L))
    assert(api.ref("ingested").count() == 4)

    // the commit record rides the pointer metadata (ADVICE r8: the
    // append + marker-file sequence had a crash window; data and batch
    // id now flip in one ATOMIC_MOVE) …
    assert(StreamIngest.lastCommitted(api, "ingested") == 2L)
    // … and maintenance rewrites must CARRY it: a compaction that
    // dropped the batch id would make the next restart replay
    // duplicate every in-flight batch
    api.compactModel("ingested")
    assert(StreamIngest.lastCommitted(api, "ingested") == 2L)
    assert(!StreamIngest.applyBatch(api, "ingested",
      Seq(99L).toDF("x"), batchId = 2L))
    assert(api.ref("ingested").count() == 4)
    assert(StreamIngest.applyBatch(api, "ingested",
      Seq(5L).toDF("x"), batchId = 3L))
    assert(api.ref("ingested").orderBy("x")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))

    // state written before the atomic-commit change carried its record
    // in a _stream_commit marker file — a restart must still honor it
    // (or replays would duplicate), and the next applyBatch migrates
    // the record into pointer meta, which takes precedence after
    val legacy = Paths.get(api.registry.root, "ingested", "_stream_commit")
    Files.writeString(legacy, "7")
    assert(StreamIngest.lastCommitted(api, "ingested") == 3L,
      "pointer meta must win over the legacy marker")
    Files.deleteIfExists(
      Paths.get(api.registry.root, "ingested", "_current"))
    // (no pointer at all → only the legacy marker speaks)
    assert(StreamIngest.lastCommitted(api, "ingested") == 7L)
  }

  test("exactly-once ingest holds on an object-store root (PUT swap)") {
    // the scaladoc's object-store claim, executed: on a store with no
    // atomic rename the batch id still flips with the version in ONE
    // overwrite-PUT of the pointer object, so replays after a restart
    // are no-ops there too
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.sparkContext.hadoopConfiguration.set("fs.s3a.impl",
      classOf[graft.api.MockObjectStoreFs].getName)
    val local = Files.createTempDirectory("graft-s3ingest")
    val api = new FalApi(spark,
      new Registry("s3a://graft-test-bucket" + local.toString),
      new RunLedger)
    val input = MemoryStream[Long]
    val q = StreamIngest.toModel(
      input.toDF().withColumnRenamed("value", "x"), api, "ing",
      Files.createTempDirectory("graft-s3ingest-ckpt").toString)
    try {
      input.addData(1L, 2L)
      q.processAllAvailable()
      input.addData(3L)
      q.processAllAvailable()
    } finally q.stop()
    assert(api.ref("ing").orderBy("x")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // replay of a committed id: no-op; compaction carries the record
    assert(!StreamIngest.applyBatch(api, "ing", Seq(99L).toDF("x"), 1L))
    assert(api.ref("ing").count() == 3)
    api.compactModel("ing")
    assert(StreamIngest.lastCommitted(api, "ing") == 1L)
    assert(StreamIngest.applyBatch(api, "ing", Seq(4L).toDF("x"), 2L))
    assert(api.ref("ing").count() == 4)
  }
}
