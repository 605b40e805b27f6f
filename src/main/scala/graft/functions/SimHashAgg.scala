package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass 60-bit SimHash aggregate: per-token bit votes accumulated in
  * a fixed 60-int buffer, final signature = sign bitmask.
  *
  * Replaces the composed explode(60 bits) → groupBy(doc, bit) →
  * groupBy(doc) pipeline — 60× less shuffle input and two fewer
  * aggregation stages; the buffer is a fixed 240-byte array, ideal for
  * partial aggregation at 100 TB.
  *
  * The token hash is the first 15 hex digits of md5 (a 60-bit value) —
  * deliberately SQL-portable: DuckDB's
  * `CAST('0x' || substr(md5(t),1,15) AS BIGINT)` computes the identical
  * value, so the whole SimHash pipeline (signatures, band buckets,
  * Hamming distances) is exactly reproducible by the oracle. Tie rule:
  * a bit is set iff its vote sum is strictly positive.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]]
    with UnaryLike[Expression] {

  import SimHashAgg.BITS

  override def createAggregationBuffer(): Array[Int] = new Array[Int](BITS)

  override def update(buffer: Array[Int], input: InternalRow)
      : Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = SimHashAgg.md5Prefix60(v.asInstanceOf[UTF8String].getBytes)
      var j = 0
      while (j < BITS) {
        if (((h >>> j) & 1L) == 1L) buffer(j) += 1 else buffer(j) -= 1
        j += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] = {
    var j = 0
    while (j < BITS) { buffer(j) += other(j); j += 1 }
    buffer
  }

  override def eval(buffer: Array[Int]): Any = {
    var sig = 0L
    var j = 0
    while (j < BITS) {
      if (buffer(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * BITS)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(BITS)(bb.getInt)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_simhash expects a string column, got " +
          child.dataType.catalogString)

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : SimHashAgg = copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}

object SimHashAgg {
  val BITS = 60

  // MessageDigest is stateful; plan expressions can be shared across
  // concurrently running tasks, so keep one digest per thread.
  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** The integer value of the first 15 hex digits of md5(bytes) — i.e.
    * the top 60 bits of the digest read big-endian. Equals Spark SQL's
    * `conv(substr(md5(x),1,15),16,10)` and DuckDB's
    * `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`.
    */
  def md5Prefix60(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var k = 0
    while (k < 15) {
      val nibble =
        if ((k & 1) == 0) (h(k >> 1) >> 4) & 0xf else h(k >> 1) & 0xf
      v = (v << 4) | nibble
      k += 1
    }
    v
  }
}
