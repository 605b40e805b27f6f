package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass 64-bit SimHash aggregate: per-token xxhash64 bit votes
  * accumulated in a 64-int buffer, final signature = sign bitmask.
  *
  * Replaces the composed explode(64 bits) → groupBy(doc, bit) →
  * groupBy(doc) pipeline — 64× less shuffle input and two fewer
  * aggregation stages; the buffer is a fixed 256-byte array, ideal for
  * partial aggregation at 100 TB.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]]
    with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buffer: Array[Int], input: InternalRow)
      : Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes(), 0L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) buffer(j) += 1 else buffer(j) -= 1
        j += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { buffer(j) += other(j); j += 1 }
    buffer
  }

  override def eval(buffer: Array[Int]): Any = {
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (buffer(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * 64)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt)
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
