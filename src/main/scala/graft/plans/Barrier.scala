package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that reports itself NON-DETERMINISTIC so the
  * optimizer never relocates a predicate containing it: not pushed
  * through joins (`PushPredicateThroughJoin`), not through projects,
  * not inferred into new filters, not folded. Evaluation and codegen
  * forward to the child untouched — semantics are the child's.
  *
  * The CHECK-constraint guard needs exactly this: its predicate wraps
  * `raise_error`, and Catalyst pushing that filter below a join in the
  * caller's plan would evaluate it on rows the join was about to drop
  * — a false-positive [[graft.sources.ConstraintViolationException]]
  * for data that would never be written. Pinning the filter where the
  * writer placed it (directly above the user plan, directly below the
  * stage write) restores write-time semantics without materializing
  * the input, which at 100 TB is not an option.
  */
case class NonPushable(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
