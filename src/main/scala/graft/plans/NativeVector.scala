package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the dense-vector dot product.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`,
  * [[graft.functions.VectorFunctions.dot]]) is evaluated element-by-
  * element through interpreted lambda plumbing and allocates an
  * intermediate products array per row — fatal inside an all-pairs
  * similarity join (N² pairs x 64 dims). This expression generates a
  * tight primitive loop via `doGenCode`, keeping the whole similarity
  * kernel inside whole-stage codegen: same fixed left-to-right fold
  * order (so results stay bit-identical to the HOF version and the
  * DuckDB oracle), no allocation.
  *
  * Elements must be non-null; arrays must be equal length (enforced by
  * construction in this engine — embeddings are fixed-dimension).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session registration + Column API for the native expressions. */
object NativeVector {

  val DotName = "graft_dot"

  /** Idempotently register the native functions on a session (temp
    * functions are per-session state; safe to call before every use).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      DotName,
      { exprs => DotProduct(exprs(0), exprs(1)) },
      "built-in")

  /** Native dot product; cast inputs to array<double> first. Requires
    * [[register]] on the owning session.
    */
  def dot(a: Column, b: Column): Column =
    call_function(DotName, a.cast("array<double>"), b.cast("array<double>"))
}
