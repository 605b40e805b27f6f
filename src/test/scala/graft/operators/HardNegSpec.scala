package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Pins the two directions of `sim_hard_negatives`' band contract that
  * the DuckDB oracle's bitwise equality cannot express on its own:
  *
  *  - the LOWER bound really cuts weak candidates the plain IVF probe
  *    would score (mining must not degenerate into plain top-k), and
  *  - the UPPER bound excludes near-duplicates: a planted exact clone
  *    of an anchor ranks FIRST in the unbanded ANN top-k yet never
  *    appears as a hard negative (a clone scored as a training
  *    negative is the false-negative failure mode the band exists to
  *    prevent).
  */
class HardNegSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("band bounds hold and the lower bound cuts sub-lo candidates") {
    val banded = Similarity2.simHardNegatives(spark, dir).collect()
    assert(banded.nonEmpty, "hard-negative mining returned no rows")
    banded.foreach { r =>
      val c = r.getAs[Double]("cosine")
      assert(c >= Similarity2.HardNegLo && c < Similarity2.HardNegHi,
        s"cosine $c escaped the band")
    }
    // The same probed cells contain sub-lo candidates — so the band is
    // doing real work relative to the unbanded probe over these cells.
    graft.functions.GraftFunctions.register(spark)
    val queries = graft.Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"),
        expr("CAST(embedding AS ARRAY<DOUBLE>)").as("emb"))
      .withColumn("norm", sqrt(expr("graft_dot_product(emb, emb)")))
    val subLo = Similarity.ivfIndexModel(spark, dir)
      .join(broadcast(Similarity.ivfQueryCells(spark, dir, queries)),
        Seq("cell"))
      .withColumn("cosine",
        clampCos(expr("graft_dot_product(q_emb, c_emb)") /
          (col("q_norm") * col("c_norm"))))
      .filter(col("cosine") < lit(Similarity2.HardNegLo))
      .count()
    assert(subLo > 0,
      "no probed candidate below the lower bound - the lo cut is vacuous here")
  }

  test("a planted clone tops plain ANN but is never a hard negative") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_hardneg_clone").toString
    val e = graft.Tables.load(spark, dir, "embeddings")
    val clone = e.filter(col("vec_id") === 3)
      .withColumn("vec_id", lit(100000L))
    e.unionByName(clone).coalesce(1).write.mode("overwrite")
      .parquet(s"$tmp/embeddings.parquet")

    // The clone's max-cosine cell IS its original's nearest cell, so
    // the plain probe finds it at rank 1 with cosine ~1.0 ...
    val top = Similarity.simIvfTopk(spark, tmp)
      .filter(col("query_id") === 3 && col("rank") === 1L)
      .collect().head
    assert(top.getAs[Long]("neighbor_id") == 100000L,
      s"clone did not rank first (got ${top.getAs[Long]("neighbor_id")})")
    assert(top.getAs[Double]("cosine") >= Similarity2.HardNegHi)

    // ... and the hard-negative miner on the same corpus excludes it
    // while still mining confusable negatives for that anchor.
    val hn = Similarity2.simHardNegatives(spark, tmp).collect()
    assert(!hn.exists(_.getAs[Long]("neighbor_id") == 100000L),
      "near-duplicate clone leaked into the hard negatives")
    assert(hn.exists(_.getAs[Long]("query_id") == 3L),
      "anchor with a clone got no hard negatives at all")
  }
}
