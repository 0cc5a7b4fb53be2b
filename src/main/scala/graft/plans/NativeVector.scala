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

/** vec (array<double>) -> packed `numBits`-bit random-hyperplane (SRP)
  * sign signature as a long. Bit-compatible with
  * [[graft.functions.VectorFunctions.hyperplaneSignature]] — plane
  * component (b, j) is the first 4 bytes of sha-256("srp:seed:b:j")
  * read as an unsigned 32-bit int, scaled to [-1, 1) — but computed
  * in one plain-JVM loop with the plane matrix cached per dimension
  * instead of per-element interpreted lambdas re-hashing every row.
  *
  * The sha-256 derivation is PORTABLE: any engine with sha256 over
  * strings (e.g. DuckDB `('0x' || substr(sha256(s),1,8))::BIGINT`)
  * reproduces the exact planes, so LSH bucket assignments are
  * verifiable cross-engine (same pattern as the MinHash oracle).
  */
case class HyperplaneSig(vec: Expression, numBits: Int, seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def child: Expression = vec
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("hyperplane_sig requires array<double>")
  }

  // plane(b, j) in [-1, 1): first 4 bytes of sha-256("srp:seed:b:j")
  // as an unsigned 32-bit int over 2^31, minus 1. Cached per observed
  // dimension; idempotent write, so the benign race under local-mode
  // thread sharing is safe.
  @transient private var planesCache: Array[Array[Double]] = _

  private def planes(dim: Int): Array[Array[Double]] = {
    val c = planesCache
    if (c != null && c.length == numBits && c(0).length == dim) return c
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val p = Array.tabulate(numBits, dim) { (b, j) =>
      HyperplaneSig.planeComponent(md, seed, b, j)
    }
    planesCache = p
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val p = planes(dim)
    var sig = 0L
    var b = 0
    while (b < numBits) {
      val row = p(b)
      var proj = 0.0
      var j = 0
      while (j < dim) {
        proj += v.getDouble(j) * row(j)
        j += 1
      }
      if (proj >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(vec = c)
}

object HyperplaneSig {
  /** Portable plane component: u / 2^31 - 1 where u is the first 4
    * bytes of sha-256("srp:seed:b:j") read big-endian unsigned —
    * identical to DuckDB's `('0x' || substr(sha256(s),1,8))::BIGINT`.
    */
  def planeComponent(md: java.security.MessageDigest, seed: Long, b: Int, j: Int): Double = {
    val d = md.digest(s"srp:$seed:$b:$j".getBytes("UTF-8"))
    val u = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
    u.toDouble / 2147483648.0 - 1.0
  }
}

/** Coercion for foldable literal arguments arriving from SQL: an
  * integer literal parses as IntegerType, so a blind asInstanceOf[Long]
  * would throw ClassCastException on the natural call
  * `graft_hyperplane_sig(v, 12, 7)`.
  */
private[plans] object LiteralArgs {
  def toInt(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
    e.eval(null) match {
      case i: java.lang.Integer => i.intValue
      case l: java.lang.Long => java.lang.Math.toIntExact(l)
      case s: java.lang.Short => s.intValue
      case other => throw new IllegalArgumentException(
        s"expected an integral literal, got $other")
    }

  def toLong(e: org.apache.spark.sql.catalyst.expressions.Expression): Long =
    e.eval(null) match {
      case i: java.lang.Integer => i.longValue
      case l: java.lang.Long => l.longValue
      case s: java.lang.Short => s.longValue
      case other => throw new IllegalArgumentException(
        s"expected an integral literal, got $other")
    }
}

/** Session registration + Column API for the native expressions. */
object NativeVector {

  val DotName = "graft_dot"
  val HyperplaneName = "graft_hyperplane_sig"

  /** Idempotently register the native functions on a session (temp
    * functions are per-session state; safe to call before every use).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      DotName,
      { exprs => DotProduct(exprs(0), exprs(1)) },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      HyperplaneName,
      { exprs =>
        HyperplaneSig(exprs(0), LiteralArgs.toInt(exprs(1)), LiteralArgs.toLong(exprs(2)))
      },
      "built-in")
  }

  /** Native dot product; cast inputs to array<double> first. Requires
    * [[register]] on the owning session.
    */
  def dot(a: Column, b: Column): Column =
    call_function(DotName, a.cast("array<double>"), b.cast("array<double>"))

  /** Native packed SRP signature. Requires [[register]]. */
  def hyperplaneSig(vec: Column, numBits: Int, seed: Long): Column = {
    import org.apache.spark.sql.functions.lit
    call_function(HyperplaneName, vec.cast("array<double>"), lit(numBits), lit(seed))
  }
}
