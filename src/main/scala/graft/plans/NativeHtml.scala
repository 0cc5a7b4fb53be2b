package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native HTML boilerplate extraction — the text-density main-content
  * stripper (Arc90-readability / jusText family) that turns a crawled
  * page into the clean `text` every curation operator here scores.
  * Together with [[graft.sources.Warc]] this completes the raw-bytes →
  * `documents` hop: WARC response body → extracted main text.
  *
  * The CONTRACT (deterministic, replayed by the spec and pinned by the
  * q_warc_extract oracle) — one linear scan per document:
  *
  *   1. `<!-- -->` comments and the full content of
  *      `<script>/<style>/<title>/<noscript>` are dropped;
  *   2. the page splits into BLOCKS at block-level tags (open or
  *      close): html/head/body, p, div, section, article, header,
  *      footer, nav, aside, ul/ol/li, table/tr/td/th, h1–h6,
  *      blockquote, pre, form, br, hr;
  *   3. inline markup is stripped; `&amp; &lt; &gt; &quot; &apos;
  *      &nbsp; &#n; &#xh;` decode; whitespace runs collapse to one
  *      space, blocks trim;
  *   4. a block SURVIVES iff its normalized length ≥ `minLen` (default
  *      25) and less than one third of its non-space characters sit
  *      inside `<a>` anchors (the Arc90 link-density cut — nav bars,
  *      footers and related-links boxes are mostly anchor text; prose
  *      is not);
  *   5. surviving blocks join with `\n`.
  *
  * Scale shape: map-only, one bounded-scratch JVM pass per row inside
  * whole-stage codegen — the same kernel contract as
  * [[NativeText]]/[[NativeNorm]]; no shuffle, no UDF boundary, no
  * external parser. A 100 TB extract is exactly as parallel as its
  * scan.
  */
object NativeHtml {

  val HtmlExtractName = "graft_html_extract"
  val HtmlLinksName = "graft_html_links"

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      HtmlExtractName, exprs => HtmlExtract(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      HtmlLinksName, exprs => HtmlLinks(exprs.head), "built-in")
  }

  /** html -> array of `<a href>` values in document order (duplicates
    * preserved; the caller dedups if its graph wants distinct edges).
    * Comment and script/style/title/noscript content is skipped with
    * the same rules as [[htmlExtractEval]], so an href inside
    * commented-out or scripted markup never becomes an edge.
    */
  def htmlLinks(html: Column): Column =
    org.apache.spark.sql.classic.GraftPlanApi.column(
      HtmlLinks(org.apache.spark.sql.classic.GraftPlanApi.expression(html)))

  /** html -> struct(text, n_blocks, kept_blocks). `text` is the
    * surviving main text ('' when nothing survives, null only for
    * null input).
    */
  def htmlExtract(html: Column, minLen: Int = 25): Column =
    org.apache.spark.sql.classic.GraftPlanApi.column(
      HtmlExtract(
        org.apache.spark.sql.classic.GraftPlanApi.expression(html), minLen))

  private val RawTextTags = Set("script", "style", "title", "noscript")
  private val BlockTags = Set(
    "html", "head", "body", "p", "div", "section", "article", "header",
    "footer", "nav", "aside", "ul", "ol", "li", "table", "tr", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre", "form",
    "br", "hr")

  /** The single-pass evaluator (see the object doc for the contract).
    * Null text is data: yields (null, 0, 0) like the
    * [[NativeText.textRepetitionEval]] family.
    */
  def htmlExtractEval(html: UTF8String, minLen: Int): InternalRow = {
    if (html == null)
      return new GenericInternalRow(Array[Any](null, 0L, 0L))
    val s = html.toString
    val n = s.length
    val out = new java.lang.StringBuilder(n / 2)
    val block = new java.lang.StringBuilder(256)
    var nBlocks = 0L
    var kept = 0L
    var textChars = 0
    var linkChars = 0
    var linkDepth = 0
    var lastWasSpace = true

    def appendChar(c: Char): Unit = {
      if (Character.isWhitespace(c)) {
        if (!lastWasSpace) { block.append(' '); lastWasSpace = true }
      } else {
        block.append(c)
        lastWasSpace = false
        textChars += 1
        if (linkDepth > 0) linkChars += 1
      }
    }

    def flushBlock(): Unit = {
      // trailing collapsed space, if any, is the only trim needed
      var len = block.length
      if (len > 0 && block.charAt(len - 1) == ' ') len -= 1
      if (len > 0) {
        nBlocks += 1
        if (len >= minLen && linkChars * 3 < textChars) {
          kept += 1
          if (out.length > 0) out.append('\n')
          out.append(block, 0, len)
        }
      }
      block.setLength(0); textChars = 0; linkChars = 0; lastWasSpace = true
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val gt = s.indexOf('>', i + 1)
          if (gt < 0) {
            // unterminated tag at EOF: nothing renderable follows
            i = n
          } else {
            var p = i + 1
            val isClose = p < gt && s.charAt(p) == '/'
            if (isClose) p += 1
            val nameStart = p
            while (p < gt && s.charAt(p) != ' ' && s.charAt(p) != '\t' &&
              s.charAt(p) != '\n' && s.charAt(p) != '\r' &&
              s.charAt(p) != '/') p += 1
            val name = s.substring(nameStart, p).toLowerCase
            i = gt + 1
            if (!isClose && RawTextTags.contains(name)) {
              // skip raw content through the matching close tag
              val close = "</" + name
              var j = i
              var found = -1
              while (found < 0 && j + close.length <= n) {
                if (s.regionMatches(true, j, close, 0, close.length))
                  found = j
                else j += 1
              }
              i = if (found < 0) n
              else {
                val cgt = s.indexOf('>', found)
                if (cgt < 0) n else cgt + 1
              }
            }
            if (name == "a") {
              if (isClose) { if (linkDepth > 0) linkDepth -= 1 }
              else linkDepth += 1
            }
            if (BlockTags.contains(name)) flushBlock()
          }
        }
      } else if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi <= i + 10) {
          val ent = s.substring(i + 1, semi)
          val decoded: Int = ent match {
            case "amp" => '&'
            case "lt" => '<'
            case "gt" => '>'
            case "quot" => '"'
            case "apos" => '\''
            case "nbsp" => ' '
            case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
              try Integer.parseInt(ent.substring(2), 16) catch {
                case _: NumberFormatException => -1
              }
            case _ if ent.startsWith("#") =>
              try Integer.parseInt(ent.substring(1)) catch {
                case _: NumberFormatException => -1
              }
            case _ => -1
          }
          if (decoded >= 0) {
            appendChar(decoded.toChar)
            i = semi + 1
          } else { appendChar('&'); i += 1 }
        } else { appendChar('&'); i += 1 }
      } else {
        appendChar(c)
        i += 1
      }
    }
    flushBlock()
    new GenericInternalRow(
      Array[Any](UTF8String.fromString(out.toString), nBlocks, kept))
  }

  private val HrefAttr = java.util.regex.Pattern.compile(
    "href\\s*=", java.util.regex.Pattern.CASE_INSENSITIVE)

  /** The link walk (see [[htmlLinks]]): one linear scan, the same
    * comment/raw-text skip rules as the extractor, href parsed from
    * `<a>` tags only (double-, single-, or un-quoted values).
    */
  def htmlLinksEval(html: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (html == null) return null
    val s = html.toString
    val n = s.length
    val hrefs = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < n) {
      if (s.charAt(i) == '<') {
        if (s.startsWith("<!--", i)) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val gt = s.indexOf('>', i + 1)
          if (gt < 0) i = n
          else {
            var p = i + 1
            val isClose = p < gt && s.charAt(p) == '/'
            if (isClose) p += 1
            val nameStart = p
            while (p < gt && !Character.isWhitespace(s.charAt(p)) &&
              s.charAt(p) != '/') p += 1
            val name = s.substring(nameStart, p).toLowerCase
            if (!isClose && name == "a") {
              // scan the tag body for href=
              val body = s.substring(p, gt)
              val m = HrefAttr.matcher(body)
              if (m.find()) {
                val v = body.substring(m.end).trim
                val value =
                  if (v.startsWith("\"")) v.substring(1).takeWhile(_ != '"')
                  else if (v.startsWith("'")) v.substring(1).takeWhile(_ != '\'')
                  else v.takeWhile(c => !Character.isWhitespace(c))
                if (value.nonEmpty) hrefs += UTF8String.fromString(value)
              }
            }
            i = gt + 1
            if (!isClose && RawTextTags.contains(name)) {
              val close = "</" + name
              var j = i
              var found = -1
              while (found < 0 && j + close.length <= n) {
                if (s.regionMatches(true, j, close, 0, close.length)) found = j
                else j += 1
              }
              i = if (found < 0) n
              else {
                val cgt = s.indexOf('>', found)
                if (cgt < 0) n else cgt + 1
              }
            }
          }
        }
      } else i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(hrefs.toArray)
  }
}

/** html -> array<string> of href values. See [[NativeHtml.htmlLinksEval]]. */
case class HtmlLinks(html: Expression) extends UnaryExpression {

  override def child: Expression = html
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = html.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"${NativeHtml.HtmlLinksName} requires a string column")
  }

  override def nullSafeEval(input: Any): Any =
    NativeHtml.htmlLinksEval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NativeHtml.htmlLinksEval($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(html = c)
}

/** html -> struct(text, n_blocks, kept_blocks). See
  * [[NativeHtml.htmlExtractEval]].
  */
case class HtmlExtract(html: Expression, minLen: Int = 25)
    extends UnaryExpression {

  override def child: Expression = html
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("text", StringType, nullable = true),
    StructField("n_blocks", LongType, nullable = false),
    StructField("kept_blocks", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = html.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"${NativeHtml.HtmlExtractName} requires a string column")
  }

  override def eval(input: InternalRow): Any =
    NativeHtml.htmlExtractEval(
      html.eval(input).asInstanceOf[UTF8String], minLen)

  // the evaluator handles a null child itself (null html is data)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = html.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = false;
      $javaType ${ev.value} = graft.plans.NativeHtml.htmlExtractEval(
        ${childGen.isNull} ? null : ${childGen.value}, $minLen);""")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(html = c)
}
