package graft.api

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** C20 incremental strategies (ref strategy list
  * `A/dbt/fal/adapters/python/impl.py:256-291`) + feature-store listing
  * (`A/fal/dbt/feature_store/feature.py:6-17`).
  */
class IncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshApi(): FalApi = {
    val root = Files.createTempDirectory("graft-incr").toString
    new FalApi(spark, new Registry(root), new RunLedger)
  }

  import spark.implicits._

  test("merge upserts by key: replaced + inserted + untouched") {
    val api = freshApi()
    api.writeToModel(Seq((1L, "a", 10.0), (2L, "b", 20.0),
      (3L, "c", 30.0)).toDF("id", "name", "v"), "m")
    // increment: update id=2, insert id=4
    api.writeToModelMerge(
      Seq((2L, "b2", 21.0), (4L, "d", 40.0)).toDF("id", "name", "v"),
      "m", keys = Seq("id"))
    val out = api.ref("m").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, "a", 10.0), (2L, "b2", 21.0),
      (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("merge on an empty target behaves as create") {
    val api = freshApi()
    api.writeToModelMerge(Seq((1L, "x")).toDF("id", "s"), "m2",
      keys = Seq("id"))
    assert(api.ref("m2").count() == 1)
  }

  test("insert_overwrite replaces only the touched partitions") {
    val api = freshApi()
    api.writeToModel(Seq(("2024-01-01", 1L), ("2024-01-01", 2L),
      ("2024-01-02", 3L), ("2024-01-03", 4L)).toDF("day", "id"), "part")
    // rewrite day 01 with a single row, leave 02/03 alone
    api.writeToModelInsertOverwrite(
      Seq(("2024-01-01", 9L)).toDF("day", "id"), "part", "day")
    val out = api.ref("part").orderBy("day", "id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("2024-01-01", 9L), ("2024-01-02", 3L),
      ("2024-01-03", 4L)))
  }

  test("feature listing derives features from meta + schema") {
    val api = freshApi()
    api.registry.register(ModelDef("feat_model",
      ModelKind.Sql("SELECT 1"),
      meta = Map("feature_store.entity_column" -> "user_id",
        "feature_store.timestamp_column" -> "ts")))
    api.writeToModel(
      Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 0.5, 3L))
        .toDF("user_id", "ts", "score", "n_orders"), "feat_model")
    val feats = api.listFeatures
    assert(feats.toSet == Set(
      ("feat_model", "score", "user_id", Some("ts")),
      ("feat_model", "n_orders", "user_id", Some("ts"))))
  }
}
