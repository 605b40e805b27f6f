package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.dotCol

class GraftFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("DotProduct matches the higher-order fold bitwise (float arrays)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.5f, -3.25f), Array(0.5f, -1.5f, 2.0f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.4f, 0.5f, 0.6f)),
      (Array.empty[Float], Array.empty[Float]))
      .toDF("a", "b")
    val out = df.select(
      expr("graft_dot_product(a, b)").as("native"),
      dotCol(col("a"), col("b")).as("folded")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("DotProduct works on double arrays and in whole-stage codegen") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    // force a non-trivial plan so codegen actually runs
    val v = df.filter(expr("graft_dot_product(a, b) > 10.0"))
      .select(expr("graft_dot_product(a, b)")).head().getDouble(0)
    assert(v == 11.0)
  }

  test("DotProduct rejects mismatched types at analysis") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Array(1.0), "x")).toDF("a", "b")
    intercept[Exception] {
      df.select(expr("graft_dot_product(a, b)")).collect()
    }
  }

  test("SimHashAgg token hash equals the SQL-portable md5-prefix form") {
    // The DuckDB oracle recomputes simhash from
    // CAST('0x' || substr(md5(t),1,15) AS BIGINT); the JVM fast path
    // must produce the identical 60-bit value (incl. multi-byte UTF-8).
    import spark.implicits._
    val toks = Seq("hello", "wörld", "a b", "日本語", "x")
    val sqlVals = toks.toDF("t")
      .select(expr("CAST(conv(substr(md5(t),1,15),16,10) AS BIGINT)"))
      .collect().map(_.getLong(0))
    val jvmVals = toks.map(t =>
      SimHashAgg.md5Prefix60(t.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    assert(sqlVals.toSeq == jvmVals)
  }

  test("MinHashAgg: signature = per-seed minimum, stable under order") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(("d1", "aa"), ("d1", "bb"), ("d1", "cc"),
      ("d2", "cc"), ("d2", "bb"), ("d2", "aa")).toDF("doc", "sh")
    val sigs = df.groupBy("doc").agg(expr("graft_minhash(sh)").as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // identical shingle sets → identical signatures regardless of order
    assert(sigs("d1") == sigs("d2"))
    assert(sigs("d1").length == 16)
    // differing sets diverge
    val other = Seq(("d3", "zz")).toDF("doc", "sh")
      .groupBy("doc").agg(expr("graft_minhash(sh)").as("sig"))
      .head().getSeq[Long](1)
    assert(other != sigs("d1"))
  }

  test("MinHashAgg estimates Jaccard via signature agreement") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // 8 shared of 10 shingles each → J = 8/12 ≈ 0.67
    val a = (0 until 10).map(i => ("a", s"sh$i"))
    val b = (2 until 12).map(i => ("b", s"sh$i"))
    val sigs = (a ++ b).toDF("doc", "sh")
      .groupBy("doc").agg(expr("graft_minhash(sh)").as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val agree = sigs("a").zip(sigs("b")).count { case (x, y) => x == y }
    assert(agree >= 6 && agree <= 15, s"agreement was $agree/16")
  }

  test("Md5Prefix equals the composed conv(substr(md5)) idiom " +
      "for every width, incl. under codegen") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // real corpus text + crafted edges (empty string, unicode, long)
    val strings = graft.Tables.load(spark, "/root/testdata/sf0.001",
        "documents")
      .select(col("text")).as[String].take(50).toSeq ++
      Seq("", "a", "zq 1", "é漢字", "x" * 5000)
    val df = strings.toDF("s")
    for (n <- Seq(1, 2, 4, 8, 15)) {
      val bad = df.select(
          expr(s"graft_md5_prefix(s, $n)").as("native"),
          expr(s"CAST(conv(substr(md5(s), 1, $n), 16, 10) AS BIGINT)")
            .as("composed"))
        .filter(col("native") =!= col("composed"))
      assert(bad.isEmpty, s"digits=$n diverged")
    }
    // null passes through
    val r = Seq[Option[String]](None).toDF("s")
      .select(expr("graft_md5_prefix(s, 15)")).head
    assert(r.isNullAt(0))
    // width bounds reject at construction
    intercept[Exception] {
      df.select(expr("graft_md5_prefix(s, 16)")).head
    }
    // arity and non-literal digits fail with a usable message, not
    // IndexOutOfBounds/NPE from the registry lambda
    val e1 = intercept[Exception] {
      df.select(expr("graft_md5_prefix(s)")).head
    }
    assert(e1.getMessage.contains("2 arguments"))
    val e2 = intercept[Exception] {
      df.select(expr("graft_md5_prefix(s, length(s))")).head
    }
    assert(e2.getMessage.contains("integer literal"))
  }
}
