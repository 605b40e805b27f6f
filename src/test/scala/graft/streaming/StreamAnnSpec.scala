package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Similarity

/** Batch/stream equivalence of the IVF probe: the fixture's 10 query
  * vectors streamed in two micro-batches must produce exactly the
  * oracle-checked sim_ivf_topk rows, each exactly once.
  */
class StreamAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("streamed query vectors get the batch IVF top-k") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val queries = graft.Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    assert(queries.length == 10)

    val input = MemoryStream[(Long, Array[Float])]
    val got = mutable.Buffer[(Long, Long, Long, Double)]()
    val q = StreamAnn.attach(spark, dir,
        input.toDF().toDF("query_id", "embedding")) { hits =>
      got ++= hits.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    }.start()
    try {
      input.addData(queries.take(5).toSeq)
      q.processAllAvailable()
      assert(got.size == 25, "first batch should emit 5 queries x top-5")
      input.addData(queries.drop(5).toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val batch = Similarity.simIvfTopk(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got.size == got.toSet.size, "cross-batch duplicate rows")
    assert(got.toSet == batch)
  }
}
