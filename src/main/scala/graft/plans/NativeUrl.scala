package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native registrable-domain (eTLD+1) kernel.
  *
  * The Column-composed formulation of the public-suffix lookup is a
  * ~50-branch `when` chain over the host expression; Catalyst's
  * project collapse re-inlines the host subtree into EVERY branch, the
  * generated method blows past janino's 64 KB limit and the whole
  * stage silently falls back to interpreted execution — precisely the
  * codegen cliff a 100 TB map pass cannot afford. This kernel is one
  * static JVM call with the suffix table as an O(1) hash set rider
  * (the [[NativeText]]/[[NativeNorm]] contract): stays inside
  * whole-stage codegen at any table size, and extending the suffix
  * Seq costs nothing at plan time.
  *
  * Semantics are EXACTLY the
  * [[graft.functions.UrlFunctions.registrableDomainSql]] CASE chain
  * (both are generated/fed from the same
  * [[graft.functions.UrlFunctions.MultiSuffixes]] constant): IPv4 or
  * dotless host → itself; host ending in `.{multi-suffix}` → last
  * three labels; otherwise → last two labels.
  */
object NativeUrl {

  val RegistrableDomainName = "graft_registrable_domain"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      RegistrableDomainName,
      exprs => RegistrableDomain(exprs.head), "built-in")

  def registrableDomain(host: Column): Column =
    org.apache.spark.sql.classic.GraftPlanApi.column(
      RegistrableDomain(
        org.apache.spark.sql.classic.GraftPlanApi.expression(host)))

  private lazy val suffixSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    graft.functions.UrlFunctions.MultiSuffixes.foreach(s.add)
    s
  }

  /** See the object doc for the contract (mirrors the SQL twin's CASE
    * chain branch for branch).
    */
  def registrableDomainEval(host: UTF8String): UTF8String = {
    if (host == null) return null
    val h = host.toString
    val n = h.length
    // '^[0-9.]+$' — non-empty all-digits-and-dots
    var ip = n > 0
    var i = 0
    var lastDot = -1
    var prevDot = -1
    while (i < n) {
      val c = h.charAt(i)
      if (c != '.' && (c < '0' || c > '9')) ip = false
      if (c == '.') { prevDot = lastDot; lastDot = i }
      i += 1
    }
    if (ip || lastDot < 0) return host
    // last two labels (the generic fallback)
    val last2 = h.substring(prevDot + 1)
    if (prevDot >= 0 && suffixSet.contains(last2)) {
      // ends_with('.suffix') with a label before it: back up one more dot
      var j = prevDot - 1
      while (j >= 0 && h.charAt(j) != '.') j -= 1
      UTF8String.fromString(h.substring(j + 1))
    } else UTF8String.fromString(last2)
  }
}

/** host -> registrable domain. See [[NativeUrl.registrableDomainEval]]. */
case class RegistrableDomain(host: Expression) extends UnaryExpression {

  override def child: Expression = host
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = host.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"${NativeUrl.RegistrableDomainName} requires a string column")
  }

  override def nullSafeEval(input: Any): Any =
    NativeUrl.registrableDomainEval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.NativeUrl.registrableDomainEval($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(host = c)
}
