package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.classic.GraftPlanApi
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point lookups into Spark's mergeable sketches.
  *
  * Spark ships `count_min_sketch(...)` as an aggregate (the sketch
  * merges map-side — the whole point at 100 TB: per-executor partials
  * are a few KB regardless of key cardinality) but offers NO engine
  * function to READ the resulting binary, so the sketch is a write-only
  * artifact without driver-side code. [[CmsEstimate]] closes the loop
  * as a proper codegen'd expression: estimated count of an item under
  * a sketch literal.
  */
object NativeSketch {

  /** Estimated occurrence count of a string item under a serialized
    * CountMinSketch (the output of `functions.count_min_sketch`). The
    * sketch must be a LITERAL — the intended shape is aggregate →
    * driver-held bytes (bounded: width×depth longs) → literal, exactly
    * the model-on-driver contract of [[graft.operators.IvfIndex]].
    */
  def cmsEstimate(sketchBytes: Array[Byte], item: Column): Column =
    GraftPlanApi.column(
      CmsEstimate(Literal(sketchBytes), GraftPlanApi.expression(item)))

  /** Shared kernel for interpreted and generated code paths. The agg
    * inserts StringType items as their utf8 bytes, so lookups must
    * hash the same bytes.
    */
  def estimate(cms: CountMinSketch, item: UTF8String): Long =
    cms.estimateCount(item.getBytes)

  def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
}

/** `estimateCount` over a literal serialized CountMinSketch. The
  * sketch deserializes ONCE per plan (lazy field riding the expression
  * tree to every task as a reference object), not per row — a
  * non-literal sketch column would force a per-row parse, so it is
  * rejected at analysis time rather than silently planning a
  * 1000x-slower query.
  */
case class CmsEstimate(sketch: Expression, item: Expression)
    extends BinaryExpression {

  override def left: Expression = sketch
  override def right: Expression = item
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (sketch.dataType, item.dataType) match {
      case (BinaryType, StringType) if sketch.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, StringType) =>
        TypeCheckResult.TypeCheckFailure(
          "cms_estimate requires a LITERAL sketch (aggregate it first, " +
            "then embed the collected bytes)")
      case _ => TypeCheckResult.TypeCheckFailure(
        "cms_estimate requires (binary sketch, string item)")
    }

  @transient private lazy val parsed: CountMinSketch = {
    val b = sketch.eval(null).asInstanceOf[Array[Byte]]
    if (b == null) null else NativeSketch.deserialize(b)
  }

  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    if (parsed == null) return null
    val i = item.eval(input)
    if (i == null) null
    else NativeSketch.estimate(parsed, i.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (parsed == null) {
      ev.copy(code = code"""
        boolean ${ev.isNull} = true;
        long ${ev.value} = -1L;""")
    } else {
      val cmsRef = ctx.addReferenceObj("cmsSketch", parsed,
        classOf[CountMinSketch].getName)
      val itemCode = item.genCode(ctx)
      ev.copy(code = code"""
        ${itemCode.code}
        boolean ${ev.isNull} = ${itemCode.isNull};
        long ${ev.value} = -1L;
        if (!${ev.isNull}) {
          ${ev.value} = graft.plans.NativeSketch.estimate($cmsRef, ${itemCode.value});
        }""")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(sketch = newLeft, item = newRight)
}
