package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantic gate for the PII scrub stage: the corpus itself is
  * PII-free (the oracle pins the all-zero counts), so this proves the
  * kernel on planted PII — counts and redactions must be exact, and
  * clean text must pass through untouched.
  */
class PiiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("planted PII is counted and redacted; clean text is untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact me at bob.smith+x@mail-site.io or 555-123-4567 now"),
      (2L, "server 10.0.255.7 and 192.168.1.1 up"),
      (3L, "no pii in this perfectly ordinary sentence"),
      (4L, "a@b.co then 999 123 4567 twice 999.123.4567"))
      .toDF("doc_id", "text")
    val out = TextAnalysis3.piiOf(docs).orderBy("doc_id")
      .select("doc_id", "n_email", "n_phone", "n_ip", "redacted")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(out(0) == ((1L, 1L, 1L, 0L,
      "contact me at <EMAIL> or <PHONE> now")))
    assert(out(1) == ((2L, 0L, 0L, 2L, "server <IP> and <IP> up")))
    assert(out(2) == ((3L, 0L, 0L, 0L,
      "no pii in this perfectly ordinary sentence")))
    // two phone formats; the dotted form is NOT a valid IPv4 (255 cap
    // not enforced by the regex, but the phone pattern wins nothing —
    // both engines must at least agree, which the oracle pins)
    assert(out(3)._2 == 1L && out(3)._3 == 2L)
  }

  test("the fixture corpus is PII-free and the hash is of unchanged text") {
    import org.apache.spark.sql.functions._
    val r = TextAnalysis3.txPii(spark, "/root/testdata/sf0.001")
      .agg(sum("n_email"), sum("n_phone"), sum("n_ip")).collect()(0)
    assert(r.getLong(0) == 0 && r.getLong(1) == 0 && r.getLong(2) == 0)
    val mismatch = TextAnalysis3.piiOf(
        graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
          .select("doc_id", "text"))
      .filter(col("redacted") =!= col("text")).count()
    assert(mismatch == 0)
  }
}
