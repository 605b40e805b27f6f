package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over two numeric arrays — the hot inner
  * loop of the similarity/dedup operators (SURVEY.md §2e E5/E6).
  *
  * Why a custom Expression (builder guidance order (b)): the composed
  * `aggregate(zip_with(...))` higher-order form is semantically right but
  * runs interpreted (lambda expressions have no doGenCode), allocating a
  * zipped array per pair; at N² pair volume that dominates. This
  * expression generates a tight fused loop inside whole-stage codegen —
  * no intermediate array, no virtual calls.
  *
  * Accumulation is a sequential left-to-right double fold — the same
  * order as the higher-order form and DuckDB's list_dot_product, so
  * results stay bitwise identical to the oracle (see
  * graft.operators.dotCol).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def elem(dt: DataType): Option[DataType] = dt match {
      case ArrayType(e @ (FloatType | DoubleType), _) => Some(e)
      case _ => None
    }
    (elem(left.dataType), elem(right.dataType)) match {
      case (Some(a), Some(b)) if a == b =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product expects two float[] or two double[] arrays, got " +
            s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }
  }

  private def elementType: DataType = left.dataType match {
    case ArrayType(e, _) => e
    case other => throw new IllegalStateException(s"unexpected: $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    elementType match {
      case FloatType =>
        while (i < n) {
          acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
          i += 1
        }
      case _ =>
        while (i < n) {
          acc += a.getDouble(i) * b.getDouble(i)
          i += 1
        }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val getter = elementType match {
      case FloatType => "getFloat"
      case _ => "getDouble"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.$getter($i) * (double) $b.$getter($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(newLeft, newRight)

  override def prettyName: String = "graft_dot_product"
}
