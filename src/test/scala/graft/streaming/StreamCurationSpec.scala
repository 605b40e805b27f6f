package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Batch/stream equivalence of the ingest curation pipeline: the same
  * documents streamed in two micro-batches must yield exactly the
  * curation decisions of a one-shot run, and the gates must actually
  * discriminate (some docs rejected, some flagged as near-dups).
  */
class StreamCurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getDouble(3), r.getDouble(4), r.getLong(5), r.getLong(6),
      r.getDouble(7), r.getBoolean(8)))

  test("streamed curation decisions equal the one-shot batch run") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // crawl noise the quality gate must reject: too short / all punct
    val junk = Array(
      (900001L, "!!! ??? ### $$$ %%% &&& *** ((( ))) @@@"),
      (900002L, "too short"),
      (900003L, ""))
    val ingest = graft.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 10 === 9)
      .select("doc_id", "text").as[(Long, String)].collect() ++ junk
    assert(ingest.nonEmpty)

    val input = MemoryStream[(Long, String)]
    val got = mutable.Buffer[(Long, String, Long, Double, Double, Long,
      Long, Double, Boolean)]()
    val q = StreamCuration.attach(spark, dir,
        input.toDF().toDF("doc_id", "text")) { decisions =>
      got ++= rows(decisions)
    }.start()
    try {
      val (first, rest) = ingest.splitAt(ingest.length / 2)
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(rest.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val oneShot = rows(StreamCuration.curateBatch(spark, dir,
      ingest.toSeq.toDF("doc_id", "text")))
    assert(got.size == got.map(_._1).distinct.size,
      "cross-batch duplicate decisions")
    assert(got.toSet == oneShot.toSet)

    // the pipeline must discriminate, not pass everything through
    assert(oneShot.length < ingest.length, "quality gate rejected nothing")
    assert(oneShot.exists(_._9), "no near-dup flagged")
    assert(oneShot.exists(!_._9), "everything flagged as near-dup")
  }

  test("curation decisions stream into the model store exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import java.nio.file.Files
    import graft.api.{FalApi, Registry, RunLedger}

    val ingest = graft.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 10 === 9)
      .select("doc_id", "text").as[(Long, String)].collect()
    val api = new FalApi(spark,
      new Registry(Files.createTempDirectory("graft-cur").toString),
      new RunLedger)
    val input = MemoryStream[(Long, String)]
    val q = StreamCuration.toModel(spark, dir,
      input.toDF().toDF("doc_id", "text"), api, "curated",
      Files.createTempDirectory("graft-cur-ckpt").toString)
    try {
      val (first, rest) = ingest.splitAt(ingest.length / 2)
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(rest.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val stored = rows(api.ref("curated")).toSet
    val oneShot = rows(StreamCuration.curateBatch(spark, dir,
      ingest.toSeq.toDF("doc_id", "text"))).toSet
    assert(stored == oneShot)

    // restart replay of a committed batch id must not duplicate rows
    val n = api.ref("curated").count()
    assert(!StreamIngest.applyBatch(api, "curated",
      StreamCuration.curateBatch(spark, dir,
        ingest.take(3).toSeq.toDF("doc_id", "text")), batchId = 0L))
    assert(api.ref("curated").count() == n)
  }
}
