package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sitemap-protocol parsing (sitemaps.org, the target of RFC 9309's
  * `Sitemap:` robots directive) as pure builtin Column expressions —
  * no UDF and no XML library on the hot path: the protocol's structure
  * is shallow and fixed (`<urlset><url><loc/lastmod/changefreq/
  * priority>`, or `<sitemapindex><sitemap><loc>`), so anchored
  * non-greedy regexes over the document text parse it exactly,
  * codegen'd per row. Unknown tags are ignored; a `<url>` block
  * without a `<loc>` yields a NULL loc for the caller to filter; the
  * five predefined XML entities are unescaped (`&amp;` last, so an
  * escaped ampersand can never fabricate a new entity).
  *
  * Scale shape: map-only per sitemap document. The protocol caps one
  * sitemap at 50k URLs / 50 MB uncompressed, so the per-row explode is
  * bounded by the spec, not by the corpus; a crawl's sitemap volume
  * scales as documents, never as document pairs.
  */
object Sitemaps {

  /** The five predefined XML entities, unescaped in the only sound
    * order (`&amp;` last).
    */
  private def unescapeXml(c: Column): Column =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&amp;" -> "&")
      .foldLeft(c) { case (acc, (ent, ch)) =>
        replace(acc, lit(ent), lit(ch))
      }

  /** Trimmed, entity-unescaped text of `<tag>…</tag>` inside `block`;
    * NULL when the tag is absent or empty.
    */
  private def tagText(block: Column, tag: String): Column = {
    val raw = regexp_extract(block,
      s"(?s)<$tag\\b[^>]*>\\s*(.*?)\\s*</$tag>", 1)
    when(raw === "", lit(null)).otherwise(unescapeXml(raw))
  }

  /** True when the document is a sitemap INDEX (its `<loc>`s point at
    * further sitemaps, not at pages).
    */
  def isSitemapIndex(xml: Column): Column =
    instr(xml, "<sitemapindex") > 0

  /** The `<sitemap><loc>` targets of a sitemap-index document. */
  def sitemapIndexLocs(xml: Column): Column =
    filter(
      transform(
        regexp_extract_all(xml, lit("(?s)<sitemap\\b[^>]*>(.*?)</sitemap>"),
          lit(1)),
        b => tagText(b, "loc")),
      v => v.isNotNull)

  /** One struct per `<url>` entry of a urlset document:
    * `loc` (unescaped), `lastmod` (raw W3C datetime text),
    * `lastmod_ts` (parsed, NULL on garbage — untrusted fetched text
    * must degrade, never fail the job), `changefreq`, `priority`
    * (double, NULL on garbage).
    */
  def sitemapEntries(xml: Column): Column =
    transform(
      regexp_extract_all(xml, lit("(?s)<url\\b[^>]*>(.*?)</url>"), lit(1)),
      b => {
        val lastmod = tagText(b, "lastmod")
        struct(
          tagText(b, "loc").as("loc"),
          lastmod.as("lastmod"),
          lastmod.try_cast("timestamp").as("lastmod_ts"),
          tagText(b, "changefreq").as("changefreq"),
          tagText(b, "priority").try_cast("double").as("priority"))
      })

  /** The `Sitemap:` directives of a robots.txt body (RFC 9309 §2.3's
    * group-independent line — [[Robots.robotsRules]] deliberately
    * ignores it; this is its consumer). Comment-stripped,
    * case-insensitive key, value taken verbatim after the FIRST colon
    * (the URL itself contains colons).
    */
  def sitemapsOf(robotsTxt: Column): Column = {
    val vals = transform(split(robotsTxt, "\\r?\\n"), raw => {
      val line = trim(element_at(split(raw, "#"), 1))
      when(line.rlike("(?i)^sitemap\\s*:"),
        trim(regexp_replace(line, "(?i)^sitemap\\s*:", "")))
    })
    filter(vals, v => v.isNotNull && v =!= "")
  }
}
