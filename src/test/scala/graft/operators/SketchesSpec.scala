package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Invariant coverage for the sketch/layout pack (value-level parity is
  * the DuckDB oracle's job; these pin the guarantees the sketches are
  * FOR — the properties a user relies on at scale).
  */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("count-min estimates never undercount and respect the CMS bound") {
    val rows = Sketches.qCmsHeavy(spark, dir).collect()
    assert(rows.length == 20)
    val stream = graft.Tables.load(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.explode(
        TextAnalysis.tokens(org.apache.spark.sql.functions.col("text"))))
      .count()
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_cnt")
      val est = r.getAs[Long]("cms_cnt")
      assert(est >= exact, s"CMS undercounted ${r.getAs[String]("term")}")
    }
    // the CMS error guarantee is in expectation (≈ stream/width per
    // row), so bound the MEAN overcount, with slack for Zipf-heavy
    // bucket collisions among the top tokens themselves
    val meanOver = rows.map(r =>
      r.getAs[Long]("cms_cnt") - r.getAs[Long]("exact_cnt")).sum.toDouble /
      rows.length
    assert(meanOver <= stream.toDouble / 512 * 8,
      s"mean overcount $meanOver implausible for stream=$stream")
  }

  test("bloom filter has no false negatives, and accounting adds up") {
    Sketches.qBloomJoin(spark, dir).collect().foreach { r =>
      val pass = r.getAs[Long]("n_pass_bloom")
      val hit = r.getAs[Long]("n_match")
      val fp = r.getAs[Long]("n_false_pos")
      assert(pass == hit + fp, "bloom passes must be matches + false pos")
      assert(pass >= hit, "a bloom filter must never reject a member")
      assert(fp <= r.getAs[Long]("n_orders"))
    }
  }

  test("z-order ranges bound both dimensions tighter than a 1-d sort") {
    val rows = Sketches.qZorder(spark, dir).collect()
    assert(rows.nonEmpty)
    // each 1024-wide z range fixes the top 5 interleaved bit pairs =
    // the high 5 bits of x and y alternate... conservatively: both
    // spans must be well under the full 0..255 domain
    rows.foreach { r =>
      val sx = r.getAs[Long]("max_x") - r.getAs[Long]("min_x")
      val sy = r.getAs[Long]("max_y") - r.getAs[Long]("min_y")
      assert(sx <= 127 && sy <= 127,
        s"z range ${r.getAs[Long]("z_range")} box $sx x $sy not local")
    }
  }

  test("weighted sample is deterministic and favors long documents") {
    val s1 = Curation.txSampleWeighted(spark, dir).collect()
    val s2 = Curation.txSampleWeighted(spark, dir).collect()
    assert(s1.toSeq == s2.toSeq)
    assert(s1.length == 100)
    val docs = graft.Tables.load(spark, dir, "documents")
    val meanAll = docs.agg(org.apache.spark.sql.functions
      .avg("n_chars")).head().getDouble(0)
    val meanSample = s1.map(_.getAs[Long]("n_chars")).sum.toDouble /
      s1.length
    assert(meanSample > meanAll,
      s"weighted sample mean $meanSample should exceed corpus $meanAll")
  }
}
