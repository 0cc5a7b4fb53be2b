package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native RFC 9309 path-pattern matcher for the robots gate
  * (ref: stephanesol/pyspark-scd has no crawl layer; this serves the
  * commissioned 100 TB pipeline surface).
  *
  * RFC 9309 §2.2.3 match semantics: a rule path matches a URL path
  * from the FIRST octet (implicit start anchor, implicit open end),
  * `*` matches any run of characters including the empty run, and a
  * TRAILING `$` anchors the end of the pattern ("designates the end of
  * the match pattern"); a `$` anywhere else is a literal.
  *
  * Why native instead of a composed LIKE: the pattern is a per-row
  * column (rules arrive parsed from fetched robots.txt), and Catalyst's
  * `Like` with a non-foldable pattern recompiles its regex FOR EVERY
  * ROW — at frontier scale that is |urls| × |rules-per-domain| regex
  * compiles inside the hottest gate of the crawl loop. This kernel is
  * one static JVM call (the [[NativeUrl]]/[[NativeText]] contract):
  * the classic two-pointer glob walk, O(|path|·|stars|) worst case
  * with zero allocation beyond the two backing strings, and it stays
  * inside whole-stage codegen.
  */
object NativeRobots {

  val RobotsMatchName = "graft_robots_match"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      RobotsMatchName,
      exprs => RobotsMatch(exprs.head, exprs(1)), "built-in")

  def robotsMatch(path: Column, pattern: Column): Column =
    org.apache.spark.sql.classic.GraftPlanApi.column(
      RobotsMatch(
        org.apache.spark.sql.classic.GraftPlanApi.expression(path),
        org.apache.spark.sql.classic.GraftPlanApi.expression(pattern)))

  /** True iff `path` matches robots rule `pattern` under RFC 9309
    * semantics (see object doc). Standard iterative glob matcher with
    * single-level backtracking: on a mismatch past a `*`, re-anchor
    * the star one character later — correct because `*` is the only
    * variable-width token.
    */
  def robotsMatchEval(path: UTF8String, pattern: UTF8String): Boolean = {
    if (path == null || pattern == null) return false
    val p = path.toString
    val raw = pattern.toString
    val anchored = raw.nonEmpty && raw.charAt(raw.length - 1) == '$'
    val pat = if (anchored) raw.substring(0, raw.length - 1) else raw
    val n = p.length
    val m = pat.length
    var i = 0
    var j = 0
    var star = -1
    var mark = 0
    while (i < n) {
      // unanchored pattern fully consumed = prefix match (the RFC's
      // implicit open end); anchored patterns must survive to i == n
      if (!anchored && j == m) return true
      if (j < m && pat.charAt(j) == '*') { star = j; mark = i; j += 1 }
      else if (j < m && pat.charAt(j) == p.charAt(i)) { i += 1; j += 1 }
      else if (star >= 0) { mark += 1; i = mark; j = star + 1 }
      else return false
    }
    // path consumed: remaining pattern chars must all be `*` (each can
    // match the empty run); anything else is an unmet literal
    while (j < m && pat.charAt(j) == '*') j += 1
    j == m
  }
}

/** (path, pattern) -> boolean. See [[NativeRobots.robotsMatchEval]]. */
case class RobotsMatch(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"${NativeRobots.RobotsMatchName} requires (string, string)")
    }

  override def nullSafeEval(pathIn: Any, patIn: Any): Any =
    NativeRobots.robotsMatchEval(
      pathIn.asInstanceOf[UTF8String], patIn.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev,
      (p, q) => s"graft.plans.NativeRobots.robotsMatchEval($p, $q)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
