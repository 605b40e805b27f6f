package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code: the
  * first `digits` hex nibbles of md5(bytes) as an unsigned BIGINT —
  * bit-identical to `CAST(conv(substr(md5(s),1,digits),16,10) AS
  * BIGINT)` (and to DuckDB's `CAST(concat('0x', substr(md5(s),1,
  * digits)) AS BIGINT)`), computed straight from the digest bytes with
  * no hex string, no substring, and no string→long parse.
  */
object Md5PrefixUtil {
  def compute(s: UTF8String, digits: Int): Long = {
    val d = org.apache.commons.codec.digest.DigestUtils.md5(s.getBytes)
    var v = 0L
    var i = 0
    while (i < digits) {
      val b = d(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }
}

/** Native form of the repo's SQL-portable hash idiom (SURVEY.md §2e:
  * the md5-prefix BIGINT family every hashed operator shares with its
  * DuckDB oracle). The composed `conv(substr(md5(s),1,n),16,10)`
  * allocates a 32-char hex string, a substring, and a radix parse per
  * call — this expression is the same value off the raw digest, fused
  * into whole-stage codegen. Used on the hottest path (the standing
  * 10-gram build hashes every gram occurrence in the corpus); `digits`
  * ≤ 15 keeps the value inside a signed BIGINT.
  */
case class Md5Prefix(child: Expression, digits: Int)
    extends UnaryExpression {

  require(digits >= 1 && digits <= 15,
    s"graft_md5_prefix digits must be in [1, 15], got $digits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_md5_prefix expects a string, got " +
          child.dataType.catalogString)

  override def nullSafeEval(input: Any): Any =
    Md5PrefixUtil.compute(input.asInstanceOf[UTF8String], digits)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5PrefixUtil.compute($c, $digits);")

  override protected def withNewChildInternal(newChild: Expression)
      : Md5Prefix = copy(child = newChild)

  override def prettyName: String = "graft_md5_prefix"
}
