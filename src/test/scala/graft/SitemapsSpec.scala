package graft

import org.apache.spark.sql.functions._

import graft.operators.Sitemaps

/** Parse gates for the sitemap protocol operators: entry extraction
  * with entity unescaping and tolerant lastmod/priority parsing,
  * index-vs-urlset detection, and the robots `Sitemap:` directive.
  */
class SitemapsSpec extends SparkSpec {
  import spark.implicits._

  private def entries(xml: String): Seq[(Option[String], Option[String],
      Option[java.sql.Timestamp], Option[String], Option[Double])] =
    Seq(xml).toDF("xml")
      .select(explode(Sitemaps.sitemapEntries(col("xml"))).as("e"))
      .select("e.loc", "e.lastmod", "e.lastmod_ts", "e.changefreq",
        "e.priority")
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        Option(r.getTimestamp(2)), Option(r.getString(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toSeq

  test("urlset entries parse with entities, W3C datetimes and garbage tolerance") {
    val xml =
      """<urlset>
        |<url><loc>https://e.x/a</loc><lastmod>2024-03-01T12:30:00+00:00</lastmod>
        |<changefreq>daily</changefreq><priority>0.8</priority></url>
        |<url><loc> https://e.x/p?a=1&amp;b=&lt;2&gt; </loc>
        |<lastmod>not-a-date</lastmod><priority>often</priority></url>
        |<url><priority>0.5</priority></url>
        |</urlset>""".stripMargin
    val es = entries(xml)
    assert(es.size === 3)
    assert(es(0)._1 === Some("https://e.x/a"))
    assert(es(0)._3.map(_.toInstant.toString) ===
      Some("2024-03-01T12:30:00Z"))
    assert(es(0)._4 === Some("daily"))
    assert(es(0)._5 === Some(0.8))
    // entities unescape; surrounding whitespace trims
    assert(es(1)._1 === Some("https://e.x/p?a=1&b=<2>"))
    // garbage lastmod/priority degrade to NULL, raw lastmod kept
    assert(es(1)._2 === Some("not-a-date"))
    assert(es(1)._3 === None)
    assert(es(1)._5 === None)
    // loc-less entry surfaces with NULL loc for the caller to drop
    assert(es(2)._1 === None)
    // &amp;lt; must unescape to the literal "&lt;", never to "<"
    assert(entries("<urlset><url><loc>https://e.x/?q=&amp;lt;</loc></url></urlset>")
      .head._1 === Some("https://e.x/?q=&lt;"))
  }

  test("index detection and index locs; a urlset yields no index locs") {
    val idx =
      """<sitemapindex>
        |<sitemap><loc>https://e.x/s1.xml</loc><lastmod>2024-01-01</lastmod></sitemap>
        |<sitemap><loc>
        |  https://e.x/s2.xml
        |</loc></sitemap>
        |<sitemap></sitemap>
        |</sitemapindex>""".stripMargin
    val df = Seq(idx, "<urlset><url><loc>https://e.x/a</loc></url></urlset>")
      .toDF("xml")
    val flags = df.select(Sitemaps.isSitemapIndex(col("xml")))
      .collect().map(_.getBoolean(0)).toSeq
    assert(flags === Seq(true, false))
    val locs = df.filter(Sitemaps.isSitemapIndex(col("xml")))
      .select(explode(Sitemaps.sitemapIndexLocs(col("xml"))))
      .collect().map(_.getString(0)).toSeq
    assert(locs === Seq("https://e.x/s1.xml", "https://e.x/s2.xml"))
  }

  test("robots Sitemap directives: case-insensitive, comment-stripped, colon-safe") {
    val robots =
      """User-agent: *
        |Disallow: /private/
        |Sitemap: https://e.x/sm.xml
        |SITEMAP:https://e.x/sm2.xml   # trailing comment
        |# Sitemap: https://e.x/commented.xml
        |Sitemap:
        |sitemapX: https://e.x/not-a-directive.xml
        |""".stripMargin
    val got = Seq(robots).toDF("t")
      .select(explode(Sitemaps.sitemapsOf(col("t"))))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("https://e.x/sm.xml", "https://e.x/sm2.xml"))
  }
}
