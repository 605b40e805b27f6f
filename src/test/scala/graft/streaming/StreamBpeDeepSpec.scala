package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Curation2

/** Batch/stream equivalence of the DEEP (batched-trained) streaming
  * tokenizer: documents streamed through [[StreamBpeDeep]] must count
  * tokens exactly as (a) an INDEPENDENT sequential fold of the full
  * learned merge sequence in (it, rank) order, and (b) the standing
  * `tx_bpe_apply_deep` segmentation for corpus words — while a
  * dictionary-only batch (no novel vocabulary) must never enter the
  * replay path, and novel words must segment the way the trained
  * tokenizer would (merges apply to them; a lookup would miss).
  */
class StreamBpeDeepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def applyOnce(syms: List[String], l: String, r: String)
      : List[String] = syms match {
    case a :: b :: rest if a == l && b == r =>
      (a + b) :: applyOnce(rest, l, r)
    case a :: rest => a :: applyOnce(rest, l, r)
    case Nil => Nil
  }

  private def refTokens(word: String,
      merges: Seq[(String, String)]): Int =
    merges.foldLeft(word.map(_.toString).toList) {
      case (syms, (l, r)) => applyOnce(syms, l, r)
    }.size

  test("deep streamed tokenization: dictionary hits for corpus words, " +
      "full merge replay for novel vocabulary") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // full learned sequence in (it, mrank) order — the fold reference.
    // Within one iteration batch the kept pairs are symbol-disjoint, so
    // folding them in rank order equals the simultaneous apply.
    val learned = Curation2.txBpeBatch(spark, dir)
      .orderBy("it", "mrank").collect()
      .map(r => (r.getString(2), r.getString(3))).toSeq
    assert(learned.size >= 50, s"expected deep training: ${learned.size}")

    val corpusDocs = graft.Tables.load(spark, dir, "documents")
      .filter(col("doc_id").isin(1L, 2L))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val (l1, r1) = learned.head
    val novelWords = Seq(s"zq$l1${r1}xv", s"$l1$r1$l1$r1", "zzzzz")
    val novel = (777001L, novelWords.mkString(" "))

    val input = MemoryStream[(Long, String)]
    val got = mutable.Buffer[(Long, Long, Long)]()
    val q = StreamBpeDeep.attach(spark, dir,
        input.toDF().toDF("doc_id", "text")) { out =>
      got ++= out.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2)))
    }.start()
    try {
      // batch 1: pure corpus vocabulary — the dictionary path alone
      input.addData(corpusDocs)
      q.processAllAvailable()
      assert(got.size == 2)
      // batch 2: novel vocabulary exercises the merge-replay fallback
      input.addData(Seq(novel))
      q.processAllAvailable()
    } finally q.stop()
    val byId = got.map(r => r._1 -> r).toMap
    assert(got.size == 3)

    // (a) the independent full-sequence fold, every doc
    for ((id, text) <- corpusDocs :+ novel) {
      val ws = text.split(" ").filter(_.nonEmpty)
      assert(byId(id)._2 == ws.length.toLong, s"n_words of doc $id")
      assert(byId(id)._3 == ws.map(refTokens(_, learned)).sum.toLong,
        s"n_tokens of doc $id under the deep fold")
    }
    // novel words really merged (fewer tokens than characters)
    assert(byId(777001L)._3 < novelWords.map(_.length).sum.toLong)

    // (b) corpus docs agree with the standing DEEP segmentation, and
    // deep counts are strictly coarser than the 3-merge twin's
    val segTokens = Curation2.txBpeApplyDeep(spark, dir)
      .select(col("term"), col("n_syms")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((id, text) <- corpusDocs) {
      val expect = text.split(" ").filter(_.nonEmpty).map(segTokens).sum
      assert(byId(id)._3 == expect,
        s"doc $id disagrees with the standing deep segmentation")
    }
    val shallowSeg = Curation2.txBpeApply(spark, dir)
      .select(col("term"), col("n_syms")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val corpusTotalDeep = corpusDocs.map { case (_, t) =>
      t.split(" ").filter(_.nonEmpty).map(segTokens).sum }.sum
    val corpusTotalShallow = corpusDocs.map { case (_, t) =>
      t.split(" ").filter(_.nonEmpty).map(shallowSeg).sum }.sum
    assert(corpusTotalDeep <= corpusTotalShallow)
  }
}
