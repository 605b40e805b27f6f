package graft.api

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** C23 snapshot materialization — SCD2 semantics of
  * FalApi.writeToModelSnapshot (dbt check-strategy snapshots; the
  * reference's jaffle project declares `snapshot-paths` at
  * `projects/adapter/cli_tests/projects/002_jaffle_shop/
  * dbt_project.yml:8`).
  */
class SnapshotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshApi(): FalApi = {
    val root = Files.createTempDirectory("graft-snapshot").toString
    new FalApi(spark, new Registry(root), new RunLedger)
  }

  private def state(rows: (Long, String)*) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map { case (k, s) => org.apache.spark.sql.Row(k, s) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("status",
          org.apache.spark.sql.types.StringType))))
  }

  private val t1 = Timestamp.valueOf("2024-01-01 00:00:00")
  private val t2 = Timestamp.valueOf("2024-02-01 00:00:00")

  test("first snapshot opens every row; refresh closes only changes") {
    val api = freshApi()
    api.writeToModelSnapshot(state(1L -> "open", 2L -> "open"),
      "snap", Seq("id"), Seq("status"), t1)
    val first = api.ref("snap").collect()
    assert(first.length == 2 && first.forall(_.getAs[Timestamp](
      "dbt_valid_to") == null))

    // id 1 changes, id 2 unchanged, id 3 appears
    api.writeToModelSnapshot(
      state(1L -> "closed", 2L -> "open", 3L -> "open"),
      "snap", Seq("id"), Seq("status"), t2)
    val rows = api.ref("snap").orderBy("id", "dbt_valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getAs[Timestamp]("dbt_valid_from"),
        r.getAs[Timestamp]("dbt_valid_to")))
    assert(rows.toSeq == Seq(
      (1L, "open", t1, t2), // closed at t2
      (1L, "closed", t2, null), // reopened with the new value
      (2L, "open", t1, null), // untouched
      (3L, "open", t2, null))) // new key opens at t2
  }

  test("keys absent from a refresh stay open (dbt hard-delete default)") {
    val api = freshApi()
    api.writeToModelSnapshot(state(1L -> "a", 2L -> "b"), "snap2",
      Seq("id"), Seq("status"), t1)
    api.writeToModelSnapshot(state(1L -> "a"), "snap2",
      Seq("id"), Seq("status"), t2)
    val open = api.ref("snap2").filter(col("dbt_valid_to").isNull)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(open == Seq(1L, 2L))
  }

  test("a refresh with no changes is a no-op on the history") {
    val api = freshApi()
    api.writeToModelSnapshot(state(1L -> "x"), "snap3",
      Seq("id"), Seq("status"), t1)
    api.writeToModelSnapshot(state(1L -> "x"), "snap3",
      Seq("id"), Seq("status"), t2)
    val rows = api.ref("snap3").collect()
    assert(rows.length == 1 &&
      rows.head.getAs[Timestamp]("dbt_valid_from") == t1)
  }
}
