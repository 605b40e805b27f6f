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
      (4L, "a@b.co then 999 123 4567 twice 999.123.4567"),
      (5L, "intl +1-555-867-5309 or +1 555 867 5309 works"),
      (6L, "office (555) 867-5309 and (555)867-5309 too"),
      (7L, "ssn 123-45-6789 card 4111-1111-1111-1111 or 4111 1111 1111 1111"))
      .toDF("doc_id", "text")
    val out = TextAnalysis3.piiOf(docs).orderBy("doc_id")
      .select("doc_id", "n_email", "n_phone", "n_phone_intl",
        "n_phone_paren", "n_ssn", "n_cc", "n_ip", "redacted")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getString(8)))
    assert(out(0) == ((1L, 1L, 1L, 0L, 0L, 0L, 0L, 0L,
      "contact me at <EMAIL> or <PHONE> now")))
    assert(out(1) == ((2L, 0L, 0L, 0L, 0L, 0L, 0L, 2L,
      "server <IP> and <IP> up")))
    assert(out(2) == ((3L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
      "no pii in this perfectly ordinary sentence")))
    // two phone formats; the dotted form is NOT a valid IPv4 (255 cap
    // not enforced by the regex, but the phone pattern wins nothing —
    // both engines must at least agree, which the oracle pins)
    assert(out(3)._2 == 1L && out(3)._3 == 2L && out(3)._8 == 0L)
    // +1 forms: counted by BOTH n_phone_intl and n_phone (the 10-digit
    // tail matches the plain pattern on the original text — documented
    // overlap) but redacted ONCE because the intl pattern runs first
    assert(out(4) == ((5L, 0L, 2L, 2L, 0L, 0L, 0L, 0L,
      "intl <PHONE> or <PHONE> works")))
    // parenthesized: optional space; the no-space form's tail
    // "867-5309" is only 8 digits so the plain pattern stays quiet
    assert(out(5) == ((6L, 0L, 0L, 0L, 2L, 0L, 0L, 0L,
      "office <PHONE> and <PHONE> too")))
    // SSN and card shapes; space-separated card matches too
    assert(out(6) == ((7L, 0L, 0L, 0L, 0L, 1L, 2L, 0L,
      "ssn <SSN> card <CC> or <CC>")))
  }

  test("raw corpus is PII-free; txPii's plants make every family nonzero") {
    import org.apache.spark.sql.functions._
    // (a) the RAW generated corpus triggers none of the patterns —
    // including the widened phone/SSN/card families — so production
    // text passes through unredacted
    val raw = TextAnalysis3.piiOf(
      graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text"))
    assert(raw.filter(col("redacted") =!= col("text")).count() == 0)
    // (b) the oracle-checked query plants PII on every fifth doc, so
    // the driver's compare exercises real counts and redaction: each
    // family nonzero overall, and each planted row detects in every
    // family it plants
    val out = TextAnalysis3.txPii(spark, "/root/testdata/sf0.001")
    val planted = out.filter(col("doc_id") % 5 === 0)
    assert(planted.count() > 0)
    assert(planted.filter(col("n_email") >= 1 && col("n_phone_intl") >= 1
      && col("n_phone_paren") >= 1 && col("n_ssn") >= 1
      && col("n_cc") >= 1 && col("n_ip") >= 1).count() == planted.count())
    val unplanted = out.filter(col("doc_id") % 5 =!= 0)
    val z = unplanted.agg(sum("n_email"), sum("n_phone"), sum("n_ip"),
      sum("n_ssn"), sum("n_cc")).collect()(0)
    (0 until 5).foreach(i => assert(z.getLong(i) == 0))
  }
}
