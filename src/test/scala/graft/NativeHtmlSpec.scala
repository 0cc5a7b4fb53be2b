package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.NativeHtml

/** Boilerplate-extraction contract gates: block splitting, the
  * raw-text tag skips, entity decoding, the length and link-density
  * cuts, and codegen/interpreted parity of the native kernel.
  */
class NativeHtmlSpec extends SparkSpec {
  import spark.implicits._

  private def ex(html: String, minLen: Int = 25): (String, Long, Long) = {
    val r = NativeHtml.htmlExtractEval(UTF8String.fromString(html), minLen)
    (Option(r.getUTF8String(0)).map(_.toString).orNull,
      r.getLong(1), r.getLong(2))
  }

  test("script/style/title/noscript content never leaks into a block") {
    val (t, n, k) = ex(
      "<title>T</title><style>b{}</style><script>if(a<b){}</script>" +
        "<noscript>enable js</noscript>" +
        "<p>The one genuine paragraph of this little document.</p>")
    assert(t === "The one genuine paragraph of this little document.")
    assert((n, k) === ((1L, 1L)))
  }

  test("the length cut drops short blocks; density cut drops link bars") {
    val (t, n, k) = ex(
      "<p>short one</p>" + // < 25 chars
        "<nav><a href='/'>Home page link</a> <a href='/b'>Another link text</a></nav>" +
        "<p>Content prose that easily clears the twenty-five character bar.</p>")
    assert(t === "Content prose that easily clears the twenty-five character bar.")
    assert((n, k) === ((3L, 1L)))
  }

  test("anchors inside prose survive when density stays under a third") {
    val html = "<p>A sentence of real prose that happens to " +
      "<a href='/x'>cite one link</a> without being a navigation bar.</p>"
    val (t, _, k) = ex(html)
    assert(k === 1L)
    assert(t.contains("cite one link"))
  }

  test("entities decode and whitespace collapses") {
    val (t, _, _) = ex(
      "<p>Fish &amp; chips &lt;here&gt;,\n\t  spaced&nbsp;&#65;&#x42; wide enough now</p>",
      minLen = 10)
    assert(t === "Fish & chips <here>, spaced AB wide enough now")
  }

  test("comments vanish; unknown entities and stray & pass through") {
    val (t, _, _) = ex(
      "<p>a &notathing; b <!-- <p>ghost</p> --> AT&T and more padding text</p>",
      minLen = 10)
    assert(t === "a &notathing; b AT&T and more padding text")
  }

  test("null html is data: (null, 0, 0)") {
    val r = NativeHtml.htmlExtractEval(null, 25)
    assert(r.isNullAt(0) && r.getLong(1) === 0L && r.getLong(2) === 0L)
  }

  private def links(html: String): Seq[String] = {
    val a = NativeHtml.htmlLinksEval(UTF8String.fromString(html))
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
  }

  test("href extraction: quote styles, document order, duplicates kept") {
    assert(links(
      """<a href="/x">a</a><a href='/y'>b</a><a href=/z >c</a><a href="/x">d</a>""")
      === Seq("/x", "/y", "/z", "/x"))
    assert(links("""<A HREF="/up">case</A><a class="k" href="/attr">later attr</a>""")
      === Seq("/up", "/attr"))
  }

  test("hrefs inside comments/scripts and non-anchor tags never become links") {
    assert(links(
      """<!-- <a href="/ghost">x</a> --><script>var s='<a href="/js">';</script>""" +
        """<link href="/css"><a>no href</a><a href="/real">ok</a>""")
      === Seq("/real"))
  }

  test("null html yields null links (data, not error)") {
    assert(NativeHtml.htmlLinksEval(null) === null)
  }

  test("codegen and interpreted agree on the documents corpus") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(concat(lit("<div><p>"), col("text"), lit("</p></div>")).as("h"))
    val viaExpr = docs.select(NativeHtml.htmlExtract(col("h")).as("e"))
      .select(col("e.text"), col("e.n_blocks"), col("e.kept_blocks"))
      .collect()
    val viaEval = docs.collect().map { r =>
      val o = NativeHtml.htmlExtractEval(
        UTF8String.fromString(r.getString(0)), 25)
      Row(Option(o.getUTF8String(0)).map(_.toString).orNull,
        o.getLong(1), o.getLong(2))
    }
    assert(viaExpr.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      viaEval.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
  }
}
