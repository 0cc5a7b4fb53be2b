package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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
  val CanonicalUrlName = "graft_canonical_url"
  val UrlHostName = "graft_url_host"

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      RegistrableDomainName,
      exprs => RegistrableDomain(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      CanonicalUrlName, exprs => CanonicalUrl(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      UrlHostName, exprs => UrlHost(exprs.head), "built-in")
  }

  def registrableDomain(host: Column): Column =
    org.apache.spark.sql.classic.GraftPlanApi.column(
      RegistrableDomain(
        org.apache.spark.sql.classic.GraftPlanApi.expression(host)))

  def canonicalUrl(url: Column): Column =
    org.apache.spark.sql.classic.GraftPlanApi.column(
      CanonicalUrl(
        org.apache.spark.sql.classic.GraftPlanApi.expression(url)))

  def urlHost(url: Column): Column =
    org.apache.spark.sql.classic.GraftPlanApi.column(
      UrlHost(
        org.apache.spark.sql.classic.GraftPlanApi.expression(url)))

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

  // ---- single-pass URL canonicalization ------------------------------

  // UTF8String-backed lowercase so the kernel agrees with Spark's
  // `lower()` on every code point, not just the Locale.ROOT common set
  private def lowerUtf(s: String): String =
    UTF8String.fromString(s).toLowerCase.toString

  private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isAlnum(c: Char): Boolean =
    isAlpha(c) || (c >= '0' && c <= '9')

  /** The exact-name half of [[graft.functions.UrlFunctions.TrackingParams]]
    * (everything except the `utm_*` wildcard), as an O(1) set.
    */
  private lazy val trackingExact: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    graft.functions.UrlFunctions.TrackingParams
      .filterNot(_.contains("["))
      .foreach(s.add)
    s
  }

  /** True iff a `name=value` query part is a tracking parameter under
    * the [[graft.functions.UrlFunctions]] contract: the name (before
    * the first `=`, or the whole part) is an exact member of the
    * tracking list, or `utm_` followed by one or more alphanumerics.
    */
  private def isTrackingParam(part: String): Boolean = {
    val eq = part.indexOf('=')
    val name = if (eq >= 0) part.substring(0, eq) else part
    if (trackingExact.contains(name)) return true
    if (name.length > 4 && name.startsWith("utm_")) {
      var k = 4
      while (k < name.length) {
        if (!isAlnum(name.charAt(k))) return false
        k += 1
      }
      true
    } else false
  }

  /** (start, end) of the scheme in `u` when `u` begins with
    * `scheme://`; -1 when it does not (→ not an absolute URL).
    */
  private def schemeEnd(u: String): Int = {
    val n = u.length
    if (n == 0 || !isAlpha(u.charAt(0))) return -1
    var i = 1
    while (i < n && (isAlnum(u.charAt(i)) || u.charAt(i) == '+' ||
      u.charAt(i) == '.' || u.charAt(i) == '-')) i += 1
    if (i + 2 < n && u.charAt(i) == ':' && u.charAt(i + 1) == '/' &&
      u.charAt(i + 2) == '/') i
    else -1
  }

  /** Space-trim (Spark/DuckDB `trim` strips 0x20 only, not all
    * whitespace — the kernel must agree with the SQL twin).
    */
  private def spaceTrim(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }

  /** Lowercased host of an absolute URL — userinfo (through the first
    * `@` of the authority) and port (after the first `:`) stripped;
    * empty string when the input has no `scheme://` prefix. One pass,
    * zero regex — byte-for-byte the
    * [[graft.functions.UrlFunctions.hostOfSql]] contract.
    */
  def hostOfEval(url: UTF8String): UTF8String = {
    if (url == null) return null
    val u = spaceTrim(url.toString)
    val se = schemeEnd(u)
    if (se < 0) return UTF8String.EMPTY_UTF8
    val n = u.length
    var a = se + 3
    val authStart = a
    while (a < n && u.charAt(a) != '/' && u.charAt(a) != '?' &&
      u.charAt(a) != '#') a += 1
    val auth = u.substring(authStart, a)
    val at = auth.indexOf('@')
    val hostPort = if (at >= 0) auth.substring(at + 1) else auth
    val colon = hostPort.indexOf(':')
    val host = if (colon >= 0) hostPort.substring(0, colon) else hostPort
    UTF8String.fromString(lowerUtf(host))
  }

  /** Canonical form of an absolute URL — the
    * [[graft.functions.UrlFunctions]] five-step contract in ONE bounded
    * pass (trim → scheme gate → lowercase scheme/host → userinfo and
    * default-port drop → fragment drop → tracking-param strip → empty
    * path to `/`), replacing the ~8-regexp-pass Column chain that was
    * the costliest map-only projection in the bench sweep. NULL when
    * the input has no `scheme://` prefix.
    */
  def canonicalizeUrlEval(url: UTF8String): UTF8String = {
    if (url == null) return null
    val u = spaceTrim(url.toString)
    val se = schemeEnd(u)
    if (se < 0) return null
    val scheme = lowerUtf(u.substring(0, se))
    val n = u.length
    var a = se + 3
    val authStart = a
    while (a < n && u.charAt(a) != '/' && u.charAt(a) != '?' &&
      u.charAt(a) != '#') a += 1
    val auth = u.substring(authStart, a)
    val at = auth.indexOf('@')
    val hostPort = lowerUtf(if (at >= 0) auth.substring(at + 1) else auth)
    val colon = hostPort.indexOf(':')
    val host = if (colon >= 0) hostPort.substring(0, colon) else hostPort
    // port = all-digit run after the LAST colon, anchored at the end
    // (the `:([0-9]+)$` contract)
    var port = ""
    val lastColon = hostPort.lastIndexOf(':')
    if (lastColon >= 0 && lastColon + 1 < hostPort.length) {
      var allDigits = true
      var k = lastColon + 1
      while (k < hostPort.length) {
        val c = hostPort.charAt(k)
        if (c < '0' || c > '9') allDigits = false
        k += 1
      }
      if (allDigits) port = hostPort.substring(lastColon + 1)
    }
    val keepPort = port.nonEmpty &&
      !(scheme == "http" && port == "80") &&
      !(scheme == "https" && port == "443")
    // path/query end at the first '#' (fragment drops)
    var pqEnd = a
    while (pqEnd < n && u.charAt(pqEnd) != '#') pqEnd += 1
    var qStart = a
    while (qStart < pqEnd && u.charAt(qStart) != '?') qStart += 1
    val path = u.substring(a, qStart)
    val out = new java.lang.StringBuilder(u.length + 1)
    out.append(scheme).append("://").append(host)
    if (keepPort) out.append(':').append(port)
    if (path.isEmpty) out.append('/') else out.append(path)
    if (qStart < pqEnd) {
      // strip tracking params part by part; emptied query loses its '?'
      var first = true
      var p = qStart + 1
      while (p <= pqEnd) {
        var q = p
        while (q < pqEnd && u.charAt(q) != '&') q += 1
        val part = u.substring(p, q)
        if (part.nonEmpty && !isTrackingParam(part)) {
          out.append(if (first) '?' else '&').append(part)
          first = false
        }
        p = q + 1
      }
    }
    UTF8String.fromString(out.toString)
  }
}

/** url -> canonical url (NULL for non-absolute input).
  * See [[NativeUrl.canonicalizeUrlEval]].
  */
case class CanonicalUrl(url: Expression) extends UnaryExpression {

  override def child: Expression = url
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = url.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"${NativeUrl.CanonicalUrlName} requires a string column")
  }

  override def nullSafeEval(input: Any): Any =
    NativeUrl.canonicalizeUrlEval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the kernel itself returns null for non-absolute input, so the
    // null-out must come from BOTH the child and the call result
    val c = child.genCode(ctx)
    val code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        org.apache.spark.unsafe.types.UTF8String ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.plans.NativeUrl.canonicalizeUrlEval(${c.value});
          ${ev.isNull} = ${ev.value} == null;
        }"""
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(url = c)
}

/** url -> lowercased host ('' for non-absolute input).
  * See [[NativeUrl.hostOfEval]].
  */
case class UrlHost(url: Expression) extends UnaryExpression {

  override def child: Expression = url
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = url.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"${NativeUrl.UrlHostName} requires a string column")
  }

  override def nullSafeEval(input: Any): Any =
    NativeUrl.hostOfEval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NativeUrl.hostOfEval($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(url = c)
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
