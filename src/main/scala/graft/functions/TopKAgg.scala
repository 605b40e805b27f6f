package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` — the D2 surface of SURVEY.md §2d
  * (the reference's scripts run arbitrary pandas reductions,
  * `orders_forecast.py:31-53`; the Spark-native analogue for black-box
  * per-group logic the built-in functions can't express is a typed
  * Aggregator, NOT a row UDF: it partial-aggregates map-side like any
  * native agg, so the shuffle carries one k-element buffer per
  * group-partition instead of every row).
  *
  * Exact bounded top-k of (score, tag) pairs per group. Deterministic:
  * ties order by tag, and merge(a, b) re-sorts the concatenation, so
  * the result is independent of partition order — the property every
  * oracle-checked or retry-safe pipeline aggregate needs.
  *
  * Used via `ds.groupByKey(...).agg(TopKAgg.topK(k).toColumn)`; for a
  * hot relational path prefer the window row_number/
  * TakeOrderedAndProject form (PlanPropertiesSpec's c13_topk) — this
  * exists for logic where the per-group state is genuinely custom.
  */
object TopKAgg {

  /** One scored item; `tag` is the payload carried with the score. */
  final case class Scored(score: Double, tag: String)

  /** Product-shaped buffer/output so the encoder is a native struct
    * (columnar, codegen-friendly), not an opaque kryo blob.
    */
  final case class TopList(items: Seq[Scored])

  final class TopK(k: Int) extends Aggregator[Scored, TopList, TopList] {
    require(k >= 1, "k must be >= 1")

    // descending score, ascending tag — a total order, so every
    // partition arrangement reduces to the same buffer
    private val ord: Ordering[Scored] =
      Ordering.by((s: Scored) => (-s.score, s.tag))

    override def zero: TopList = TopList(Nil)

    override def reduce(buf: TopList, a: Scored): TopList =
      TopList((a +: buf.items).sorted(ord).take(k))

    override def merge(b1: TopList, b2: TopList): TopList =
      TopList((b1.items ++ b2.items).sorted(ord).take(k))

    override def finish(reduction: TopList): TopList = reduction

    override def bufferEncoder: Encoder[TopList] = Encoders.product[TopList]
    override def outputEncoder: Encoder[TopList] = Encoders.product[TopList]
  }

  def topK(k: Int): TopK = new TopK(k)
}
