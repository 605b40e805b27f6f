package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** A native as-of join — the whole-operator custom-plan path of the
  * builder guidance (option (c): LogicalPlan + Strategy + SparkPlan via
  * SparkSessionExtensions), used where composition is genuinely worse:
  * the composed form (graft.operators.Joins2.qAsofJoin) must UNION both
  * streams into one table and run an ignore-nulls window over the
  * union, which (a) forces both inputs through one shuffle+sort wide
  * enough for the union schema and (b) only works when both sides can
  * be unioned at all. This operator keeps the two relations separate:
  * co-partition on the key, sort each side once, then a single merge
  * pass emits, for every left row, the latest right row with
  * `rightTime <= leftTime` (a left outer as-of backward join — the
  * DuckDB/kdb semantics).
  *
  * Scale shape: exactly the sort-merge-join layout — one shuffle per
  * side on the key, per-partition sort, streaming merge with O(1)
  * state (the last matching right row) — so it inherits SMJ's 100 TB
  * behavior without SMJ's inability to express "latest at or before".
  */
final case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression)
    extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans the logical AsOfJoin onto its physical merge implementation. */
object AsOfJoinStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition both sides on the key (EnsureRequirements inserts the
  // exchanges and guarantees compatible partitioning, as for SMJ)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // per-partition sort by (key, time) — the merge is then one pass
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lk = leftKeys
    val rk = rightKeys
    val lt = leftTime
    val rt = rightTime
    val keyTypes = lk.map(_.dataType)
    val timeType = lt.dataType
    val rightWidth = rightOut.size
    val out = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, leftOut)
      val rKeyProj = UnsafeProjection.create(rk, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rightOut)
      // Parents (collect's getByteArrayRdd, an exchange with no
      // intervening project) consume UnsafeRow — emit through a result
      // projection exactly as SortMergeJoinExec's resultProj does,
      // instead of a raw JoinedRow.
      val resultProj = UnsafeProjection.create(out, out)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)

      // one-row lookahead over the right side, plus the latest match:
      // O(1) state regardless of partition size
      var rPending: InternalRow = null
      var rPendingKey: InternalRow = null
      var rPendingTime: InternalRow = null
      var lastMatch: InternalRow = null
      var lastMatchKey: InternalRow = null

      def advanceRightTo(lKey: InternalRow, lTime: InternalRow): Unit = {
        var continue = true
        while (continue) {
          if (rPending == null && rIter.hasNext) {
            val r = rIter.next()
            rPending = r.copy()
            rPendingKey = rKeyProj(rPending).copy()
            rPendingTime = rTimeProj(rPending).copy()
          }
          if (rPending == null) continue = false
          else if (rPendingKey.anyNull) {
            // SQL equi-join semantics: a null key matches nothing
            // (RowOrdering would otherwise compare NULL == NULL).
            rPending = null
          } else {
            val c = keyOrd.compare(rPendingKey, lKey)
            if (c < 0) {
              rPending = null // right key already behind every future left
            } else if (c == 0 && timeOrd.compare(rPendingTime, lTime) <= 0) {
              lastMatch = rPending
              lastMatchKey = rPendingKey
              rPending = null
            } else continue = false
          }
        }
      }

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow).copy()
        val lTime = lTimeProj(lRow).copy()
        // null-keyed left rows emit unmatched (left outer), never match
        val matched = if (lKey.anyNull) false else {
          advanceRightTo(lKey, lTime)
          lastMatch != null && keyOrd.compare(lastMatchKey, lKey) == 0
        }
        resultProj(joined(lRow, if (matched) lastMatch else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User-facing constructor: `AsOf.join(purchases, clicks, Seq("user_id"),
  * "ts", "ts")` — resolves columns against the analyzed inputs, builds
  * the logical node, and relies on [[graft.GraftExtensions]] (or the
  * lazy registration here) for planning.
  */
object AsOf {
  def ensureRegistered(spark: SparkSession): Unit = {
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = strategies :+ AsOfJoinStrategy
  }

  def join(leftDf: DataFrame, rightDf: DataFrame, keys: Seq[String],
      leftTimeCol: String, rightTimeCol: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val spark = leftDf.sparkSession
    ensureRegistered(spark)
    val lPlan = leftDf.queryExecution.analyzed
    val rAnalyzed = rightDf.queryExecution.analyzed
    // Hand-built nodes bypass the analyzer's DeduplicateRelations; when
    // both sides stem from the same base relation their attribute ids
    // collide and binding resolves to the wrong side. Re-alias the
    // right output with fresh ids in that case (what dedup would do).
    val rPlan: LogicalPlan =
      if (lPlan.outputSet.intersect(rAnalyzed.outputSet).nonEmpty)
        Project(rAnalyzed.output.map(a => Alias(a, a.name)()), rAnalyzed)
      else rAnalyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name)}"))
    val lKeys = keys.map(attr(lPlan, _))
    val rKeys = keys.map(attr(rPlan, _))
    val lTime = attr(lPlan, leftTimeCol)
    val rTime = attr(rPlan, rightTimeCol)
    // The merge compares raw binary keys/times — mismatched types would
    // compare garbage instead of failing, so reject them up front.
    lKeys.zip(rKeys).foreach { case (a, b) =>
      require(a.dataType == b.dataType,
        s"as-of join key type mismatch on ${a.name}: " +
          s"${a.dataType.sql} vs ${b.dataType.sql}")
    }
    require(lTime.dataType == rTime.dataType,
      s"as-of join time type mismatch: ${lTime.dataType.sql} vs " +
        s"${rTime.dataType.sql}")
    GraftSqlBridge.ofRows(spark,
      AsOfJoin(lPlan, rPlan, lKeys, rKeys, lTime, rTime))
  }
}
