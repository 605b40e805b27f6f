package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The cluster-deployment path: a session created with
  * `spark.sql.extensions=graft.GraftExtensions` gets the custom
  * functions with no Scala registration call.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions inject graft functions into a fresh session") {
    TestSpark.spark // ensure the shared context exists
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // withExtensions is the same injection point the
      // spark.sql.extensions static conf resolves to; the conf-string
      // route needs a fresh SparkContext, which a shared test JVM
      // can't make
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val dot = s2.sql(
        "SELECT graft_dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D))")
        .head().getDouble(0)
      assert(dot == 11.0)
      val sig = s2.sql(
        "SELECT graft_minhash(s) FROM VALUES ('aa'), ('bb') AS t(s)")
        .head().getSeq[Long](0)
      assert(sig.length == 16)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
