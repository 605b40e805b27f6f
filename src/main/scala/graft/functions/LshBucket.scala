package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Random-hyperplane LSH bucket id for a float/double vector: bit j of
  * the result is the sign of the dot product with pseudo-random plane j,
  * whose components are ±1 derived from xxhash64(j, dim) — fully
  * deterministic, no stored plane matrix.
  *
  * Replaces the composed posexplode(dims) × explode(planes) →
  * groupBy(vec, plane) → groupBy(vec) pipeline (k·d rows shuffled per
  * vector) with a single linear pass per row. Runs once per vector
  * (linear stage), so CodegenFallback interpretation is fine here; the
  * quadratic pair stage uses the codegen'd [[DotProduct]].
  */
case class LshBucket(child: Expression, planes: Int = 8)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_lsh_bucket expects float[]/double[], got " +
            other.catalogString)
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var bucket = 0L
    var j = 0
    while (j < planes) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        val sign =
          if ((XXH64.hashLong(j.toLong * 1000003L + i, 42L) & 1L) == 1L)
            1.0 else -1.0
        acc += x * sign
        i += 1
      }
      if (acc > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression)
      : LshBucket = copy(child = newChild)

  override def prettyName: String = "graft_lsh_bucket"
}
