package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator Catalyst integration of the as-of join — the one
  * operator in this engine whose semantics Spark's built-in joins
  * genuinely cannot express without composition overhead.
  *
  * The composed formulation ([[graft.operators.AsOfJoin.asOfJoin]]:
  * union both sides + one window pass) is scale-correct but pays for
  * what it cannot say: every right row is null-padded up to the left
  * schema, every left row carries a null right-payload column through
  * the shuffle, and the window's `last(ignoreNulls)` runs a frame
  * machine over the merged stream. This node says the semantics
  * directly, so the physical plan is exactly: hash-partition each side
  * by its key, sort each side by (key, time), then a single
  * forward-only merge pass per partition ([[AsOfJoinExec]]) — the same
  * exchange/sort shape as a sort-merge join, with no union blow-up and
  * no window state. At 100 TB both sides shuffle once on the join key
  * and stream through the merge; peak memory is O(1) per partition
  * (one candidate right row held at a time).
  *
  * Left-outer, latest-match semantics: every left row appears exactly
  * once, carrying `rightValues` from the most recent right row with an
  * equal key and `rightTime <= leftTime` (`< ` when `strict`), or nulls
  * when no such row exists. Equal-(key, time) right rows are broken by
  * `tieBreak` ascending, last wins — matching the composed operator.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightValues: Seq[Attribute],
    tieBreak: Seq[Expression],
    strict: Boolean)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override lazy val resolved: Boolean = childrenResolved &&
    leftKeys.forall(_.resolved) && rightKeys.forall(_.resolved) &&
    leftTime.resolved && rightTime.resolved &&
    rightValues.forall(_.resolved) && tieBreak.forall(_.resolved) &&
    leftKeys.map(_.dataType) == rightKeys.map(_.dataType) &&
    leftTime.dataType == rightTime.dataType

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]. Registered through
  * [[GraftExtensions]] (`injectPlannerStrategy`) or idempotently via
  * `spark.experimental.extraStrategies`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.leftKeys, p.rightKeys, p.leftTime, p.rightTime,
        p.rightValues, p.tieBreak, p.strict,
        planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

/** Merge-based as-of join. Requires both children clustered on their
  * keys and sorted by (keys, time[, tieBreak]) — EnsureRequirements
  * inserts exactly one exchange + sort per side, and both disappear
  * when the child already satisfies them (e.g. bucketed storage).
  *
  * Per partition: advance a single right-side cursor monotonically as
  * sorted left rows stream past, remembering only the latest qualifying
  * right payload per key. No buffering of either side, no per-group
  * hash map; right rows are touched exactly once.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightValues: Seq[Attribute],
    tieBreak: Seq[Expression],
    strict: Boolean,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: tieBreak)).map(SortOrder(_, Ascending)))

  // left rows are emitted in their incoming sorted order
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val rVals = rightValues
    val outAttrs = output
    val isStrict = strict

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rightOut)
      val rValProj = UnsafeProjection.create(rVals, rightOut)
      // bind the result against nullable right attributes: unmatched
      // left rows read the all-null payload row, so the projection must
      // null-check even originally non-nullable right columns
      val resultProj = UnsafeProjection.create(
        outAttrs, leftOut ++ rVals.map(_.withNullability(true)))
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTimeExpr.dataType))
      val nullVals = new GenericInternalRow(rVals.length)
      val joined = new JoinedRow

      // single right-side cursor; key/time/payload copied on read
      // because iterator rows reuse buffers
      var rKey: UnsafeRow = null
      var rTime: UnsafeRow = null
      var rPayload: UnsafeRow = null
      def advanceRight(): Unit =
        if (rIter.hasNext) {
          val r = rIter.next()
          rKey = rKeyProj(r).copy()
          rTime = rTimeProj(r).copy()
          rPayload = rValProj(r).copy()
        } else { rKey = null; rTime = null; rPayload = null }
      advanceRight()

      // latest qualifying right payload, and the key it belongs to
      var matchKey: UnsafeRow = null
      var matchVals: UnsafeRow = null

      lIter.map { l =>
        val lKey = lKeyProj(l)
        val lTime = lTimeProj(l)
        var done = false
        while (!done && rKey != null) {
          val kc = keyOrd.compare(rKey, lKey)
          if (kc < 0) advanceRight() // right key already passed: discard
          else if (kc == 0) {
            val tc = timeOrd.compare(rTime, lTime)
            if (if (isStrict) tc < 0 else tc <= 0) {
              matchKey = rKey // already copies — safe to alias
              matchVals = rPayload
              advanceRight()
            } else done = true
          } else done = true
        }
        val vals =
          if (matchKey != null && keyOrd.compare(matchKey, lKey) == 0) matchVals
          else nullVals
        resultProj(joined(l, vals))
      }
    }
  }
}
