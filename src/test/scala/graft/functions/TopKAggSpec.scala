package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The typed-Aggregator surface (SURVEY.md D2): exact bounded top-k per
  * group, equal to the window/orderBy reference answer and independent
  * of partitioning.
  */
object TopKAggSpec {
  // top-level: an inner case class can't be re-instantiated by the
  // encoder (outer-scope capture)
  final case class Row(group: String, score: Double, tag: String)
}

class TopKAggSpec extends AnyFunSuite {
  import TopKAggSpec.Row
  private lazy val spark = TestSpark.spark

  private def data: Seq[Row] =
    for {
      g <- Seq("a", "b", "c")
      i <- 1 to 40
    } yield Row(g, (i * 7919 % 83).toDouble, s"$g-$i")

  test("agrees with the orderBy/limit reference answer per group") {
    import spark.implicits._
    val ds = spark.createDataset(data).repartition(7)
    val got = ds
      .groupByKey(_.group)
      .mapValues(r => TopKAgg.Scored(r.score, r.tag))
      .agg(TopKAgg.topK(5).toColumn.name("top"))
      .collect()
      .map { case (g, top) => g -> top.items.map(s => (s.score, s.tag)) }
      .toMap
    val want = data.groupBy(_.group).map { case (g, rows) =>
      g -> rows.map(r => (r.score, r.tag))
        .sortBy { case (s, t) => (-s, t) }.take(5)
    }
    assert(got == want)
  }

  test("result is invariant to the number of input partitions") {
    import spark.implicits._
    def run(parts: Int) = spark.createDataset(data).repartition(parts)
      .groupByKey(_.group)
      .mapValues(r => TopKAgg.Scored(r.score, r.tag))
      .agg(TopKAgg.topK(3).toColumn.name("top"))
      .collect().sortBy(_._1).toSeq
      .map { case (g, t) => g -> t.items }
    assert(run(1) == run(13))
  }

  test("k=1 returns the argmax with deterministic tie-break") {
    import spark.implicits._
    val ties = Seq(Row("g", 9.0, "zz"), Row("g", 9.0, "aa"),
      Row("g", 1.0, "mm"))
    val got = spark.createDataset(ties).repartition(3)
      .groupByKey(_.group)
      .mapValues(r => TopKAgg.Scored(r.score, r.tag))
      .agg(TopKAgg.topK(1).toColumn.name("top"))
      .collect().head._2.items
    assert(got == Seq(TopKAgg.Scored(9.0, "aa")))
  }
}
