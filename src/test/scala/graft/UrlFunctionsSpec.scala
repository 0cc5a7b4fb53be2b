package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.UrlFunctions
import graft.plans.NativeUrl

/** URL canonicalization contract gates: every rewrite step of the
  * [[UrlFunctions]] contract on targeted fixtures, plus the
  * registrable-domain kernel's suffix-table semantics.
  */
class UrlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u")
      .select(UrlFunctions.canonicalizeUrl(col("u")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq

  test("scheme/host lowercase, userinfo drop, default port drop") {
    assert(canon(
      "HTTP://User:Pw@WWW.Example.COM:80/Path/X",
      "https://Site.ORG:443/a",
      "https://site.org:8080/a") === Seq(
      "http://www.example.com/Path/X",
      "https://site.org/a",
      "https://site.org:8080/a"))
  }

  test("http :443 and https :80 are NON-default and survive") {
    assert(canon("http://h.com:443/a", "https://h.com:80/a") ===
      Seq("http://h.com:443/a", "https://h.com:80/a"))
  }

  test("fragment drops, tracking params drop, emptied query loses '?'") {
    assert(canon(
      "http://h.com/p?utm_source=x&id=7&gclid=g#frag",
      "http://h.com/p?utm_medium=m",
      "http://h.com/p?keep=1&also=2#x") === Seq(
      "http://h.com/p?id=7",
      "http://h.com/p",
      "http://h.com/p?keep=1&also=2"))
  }

  test("empty path becomes /; query after bare authority works") {
    assert(canon("http://h.com", "http://h.com?a=1#f", "http://h.com#f") ===
      Seq("http://h.com/", "http://h.com/?a=1", "http://h.com/"))
  }

  test("a tracking-prefixed param NAME only strips on exact name match") {
    // 'ref' strips; 'referrer' must NOT (the (=|$) anchor)
    assert(canon("http://h.com/p?ref=x&referrer=y") ===
      Seq("http://h.com/p?referrer=y"))
  }

  test("non-absolute input canonicalizes to NULL; whitespace trims") {
    assert(canon("not a url", "/relative/path", "  http://h.com/a  ") ===
      Seq(null, null, "http://h.com/a"))
  }

  private def dom(h: String): String = {
    val r = NativeUrl.registrableDomainEval(UTF8String.fromString(h))
    if (r == null) null else r.toString
  }

  test("registrable domain: generic, multi-label, IP, dotless, bare suffix") {
    assert(dom("www.example.com") === "example.com")
    assert(dom("a.b.news.site.co.uk") === "site.co.uk")
    assert(dom("sub.shop.com.au") === "shop.com.au")
    assert(dom("docs.example.co.jp") === "example.co.jp")
    assert(dom("example.org") === "example.org")
    assert(dom("10.0.0.1") === "10.0.0.1")
    assert(dom("localhost") === "localhost")
    assert(dom("co.uk") === "co.uk") // bare suffix: no label to add
    assert(dom("") === "")
  }

  test("hostOf: lowercase, no userinfo/port; '' for non-URLs") {
    val got = Seq("HTTP://U:p@Host.COM:8080/x?q#f", "nope")
      .toDF("u").select(UrlFunctions.hostOf(col("u")).as("h"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("host.com", ""))
  }

  test("the registrable-domain expression stays inside codegen") {
    // the whole point of the native kernel: no janino fallback
    // (concat with a non-foldable id so constant folding can't hide it)
    val df = spark.range(2).select(NativeUrl.registrableDomain(
      concat(lit("w"), col("id").cast("string"), lit(".example.com"))).as("d"))
    // the "*(n)" stage prefix is the codegen marker in the compact
    // plan string; an interpreted fallback prints a bare Project
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.orderBy("d").collect().map(_.getString(0)).toSeq ===
      Seq("example.com", "example.com"))
  }
}
