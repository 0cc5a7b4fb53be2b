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

  test("native canonicalize/host kernels == the regex-composed chains (differential)") {
    // adversarial corpus: every contract branch plus shapes the regex
    // chain handles incidentally (multiple @ and :, empty authority,
    // trailing &, bare ?, non-digit ports, uppercase scheme, unicode)
    val corpus = Seq(
      "HTTP://User:Pw@WWW.Example.COM:80/Path/X",
      "https://Site.ORG:443/a", "https://site.org:8080/a",
      "http://h.com:443/a", "https://h.com:80/a",
      "http://h.com/p?utm_source=x&id=7&gclid=g#frag",
      "http://h.com/p?utm_medium=m", "http://h.com/p?keep=1&also=2#x",
      "http://h.com", "http://h.com?a=1#f", "http://h.com#f",
      "http://h.com/p?ref=x&referrer=y", "not a url", "/relative/path",
      "  http://h.com/a  ", "http://a@b@c.com/x", "http://h.com:80:81/x",
      "http://h.com:/x", "http://h.com:8x0/x", "http:///pathonly",
      "ftp://files.example.net:21/pub", "scheme+x.y://Host/Q?utm_a=1",
      "http://h.com/p?&&a=1&", "http://h.com/p?", "http://h.com/?#",
      "http://h.com/p?utm_=x", "http://h.com/p?utm_a-b=1&_ga=2",
      "http://ünïcode.example/päth?q=ü", "HTTPS://MIXED.CaSe/UPPER?Utm_x=1",
      "http://h.com/deep/path/with?spm=a&real=b&fbclid=z",
      "x://y", "://nothing", "", "   ")
    val df = corpus.toDF("u").select(
      UrlFunctions.canonicalizeUrl(col("u")).as("native_c"),
      UrlFunctions.canonicalizeUrlComposed(col("u")).as("composed_c"),
      UrlFunctions.hostOf(col("u")).as("native_h"),
      UrlFunctions.hostOfComposed(col("u")).as("composed_h"),
      col("u"))
    df.collect().foreach { r =>
      assert(Option(r.get(0)) === Option(r.get(1)),
        s"canonicalize diverged on '${r.getString(4)}'")
      assert(r.getString(2) === r.getString(3),
        s"hostOf diverged on '${r.getString(4)}'")
    }
  }

  test("the canonical-url and host expressions stay inside codegen") {
    val df = spark.range(2).select(
      graft.plans.NativeUrl.canonicalUrl(
        concat(lit("http://w"), col("id").cast("string"),
          lit(".example.com:80/p?utm_a=1&k=2"))).as("c"),
      graft.plans.NativeUrl.urlHost(
        concat(lit("http://H"), col("id").cast("string"),
          lit(".example.com/x"))).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.orderBy("c").collect().map(r =>
      (r.getString(0), r.getString(1))).toSeq === Seq(
      ("http://w0.example.com/p?k=2", "h0.example.com"),
      ("http://w1.example.com/p?k=2", "h1.example.com")))
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
