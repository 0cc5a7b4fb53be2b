package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Queries.t
import graft.functions.UrlFunctions
import graft.operators.{Robots, Sitemaps}
import graft.plans.NativeHtml
import graft.sources.{VersionedTable, Warc}

/** The crawl-politeness loop, oracled: robots.txt parsing
  * ([[graft.operators.Robots]]), per-domain allow/deny gating over the
  * derived URL space, and the politeness-capped crawl FRONTIER — the
  * next fetch wave computed from raw WARC bytes (links out, minus
  * already-crawled, robots-gated, ranked by indegree, capped per host
  * by crawl-delay budget). Closes the loop the round-14 front door
  * opened: crawl → extract → link graph → frontier → (next crawl).
  */
object CrawlQueries {

  // ---- robots.txt parse, pinned ------------------------------------
  //
  // DuckDB has no robots parser, so q_robots_rules follows the WARC
  // pinned-row pattern: the REAL line fold runs over a constant
  // multi-group fixture exercising comments, CRLF, multi-agent groups,
  // empty paths, unknown directives and group restarts; the oracle
  // carries the expected (agent, rtype, path, delay) rows. RobotsSpec
  // asserts the same semantics locally first.

  private[graft] val RobotsFixture: String =
    "# graft crawl policy\r\n" +
      "User-agent: graftbot\n" +
      "User-agent: newsbot # co-grouped\n" +
      "Disallow: /private/\n" +
      "Allow: /private/ok\n" +
      "Crawl-delay: 2.5\n" +
      "\n" +
      "User-agent: *\n" +
      "Disallow: /tmp/\n" +
      "Unknown-directive: ignored\n" +
      "User-agent: latebot\n" +
      "Disallow: /\n"

  def robotsRules(s: SparkSession, dir: String): DataFrame = {
    // through a real file read (wholetext), like every other fixture
    // input — the plan-audit bans driver-materialized scans
    val f = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_robots_fixture")
    java.nio.file.Files.createDirectories(f)
    java.nio.file.Files.write(f.resolve("robots.txt"),
      RobotsFixture.getBytes("UTF-8"))
    s.read.option("wholetext", "true").text(f.toString)
      .select(col("value").as("txt"))
      .select(explode(Robots.robotsRules(col("txt"))).as("r"))
      .select(col("r.agent").as("agent"), col("r.rtype").as("rtype"),
        col("r.path").as("path"), col("r.delay").as("delay"))
  }

  val robotsRulesSql: String =
    """SELECT * FROM (VALUES
      |  ('graftbot', 'disallow', '/private/', CAST(NULL AS DOUBLE)),
      |  ('newsbot', 'disallow', '/private/', CAST(NULL AS DOUBLE)),
      |  ('graftbot', 'allow', '/private/ok', CAST(NULL AS DOUBLE)),
      |  ('newsbot', 'allow', '/private/ok', CAST(NULL AS DOUBLE)),
      |  ('graftbot', 'crawl-delay', '', 2.5),
      |  ('newsbot', 'crawl-delay', '', 2.5),
      |  ('*', 'disallow', '/tmp/', CAST(NULL AS DOUBLE)),
      |  ('latebot', 'disallow', '/', CAST(NULL AS DOUBLE))
      |) AS t(agent, rtype, path, delay)""".stripMargin

  // ---- RFC 9309 wildcard evaluation, pinned --------------------------
  //
  // The wildcard pattern language (`*`, trailing `$`) through the REAL
  // parse → effectiveRules → evaluate chain, against a fixture policy
  // exercising mid-pattern stars, end anchors, most-octets precedence
  // between allow and disallow, the allow-wins length tie, the
  // default-allow fall-through, and a malformed crawl-delay ("1s" —
  // must degrade to NULL under ANSI, not fail the job). DuckDB has no
  // robots matcher, so the oracle carries the closed-form expected
  // verdicts (the same pinned-row pattern as q_robots_rules; RobotsSpec
  // asserts each matcher branch locally first).

  private[graft] val WildcardFixture: String =
    "# host: wild.example\n" + // comment line: parser strips it; the
      // QUERY extracts the domain from it so the join key is
      // DATA-DERIVED (a lit() domain on both sides constant-folds the
      // equi-join into a nested-loop and the per-domain window into a
      // partition-less one — the exact 100 TB cliffs PlanAuditSpec bans)
      "User-agent: graftbot\n" +
      "Disallow: /*?sessionid=\n" + // mid-pattern star, 13 octets
      "Allow: /doc/*$\n" + // anchored allow, 7 octets
      "Disallow: /doc/\n" + // literal prefix, 5 octets
      "Disallow: /tmp/*.pdf$\n" + // star + anchor, 11 octets
      "Allow: /tmp/keep*\n" + // trailing star, 10 octets
      "Allow: /x/*y\n" + // 5 octets — ties the next rule
      "Disallow: /x/a*\n" + // 5 octets — allow wins the tie
      "Crawl-delay: 1s\n" // malformed: degrades to NULL

  private[graft] val WildcardPaths = Seq(
    "/doc/123", // allow /doc/*$ (7) beats disallow /doc/ (5)
    "/doc/1?sessionid=9", // disallow (13) beats allow (7)
    "/tmp/report.pdf", // anchored disallow matches
    "/tmp/keepsake.pdf", // disallow (11) beats allow (10)
    "/tmp/keep/a.pdfz", // $ defeats the disallow; allow matches
    "/x/ay", // 5-octet tie: allow wins
    "/x/ab", // only the disallow matches (no trailing y)
    "/other") // no rule matches: default allow

  def robotsWildcards(s: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_robots_wildcards")
    val rf = base.resolve("policy")
    val uf = base.resolve("paths")
    java.nio.file.Files.createDirectories(rf)
    java.nio.file.Files.createDirectories(uf)
    java.nio.file.Files.write(rf.resolve("robots.txt"),
      WildcardFixture.getBytes("UTF-8"))
    java.nio.file.Files.write(uf.resolve("paths.txt"),
      WildcardPaths.map(p => s"wild.example $p").mkString("\n")
        .getBytes("UTF-8"))
    // domain comes OUT OF THE DATA on both sides (the `# host:` header
    // / the paths file's first field): the domain equi-join and the
    // per-domain group stay keyed, never constant-folded
    val rules = s.read.option("wholetext", "true").text(rf.toString)
      .select(
        regexp_extract(col("value"), "# host: (\\S+)", 1).as("domain"),
        explode(Robots.robotsRules(col("value"))).as("r"))
      .select(col("domain"), col("r.agent").as("agent"),
        col("r.rtype").as("rtype"), col("r.path").as("path"),
        col("r.delay").as("delay"))
    val urls = s.read.text(uf.toString)
      .select(
        substring_index(col("value"), " ", 1).as("domain"),
        substring_index(col("value"), " ", -1).as("path"))
    Robots.evaluate(urls, Robots.effectiveRules(rules, "graftbot"))
      .select("path", "allowed", "matched_rule", "crawl_delay")
  }

  val robotsWildcardsSql: String =
    """SELECT * FROM (VALUES
      |  ('/doc/123', TRUE, '/doc/*$', CAST(NULL AS DOUBLE)),
      |  ('/doc/1?sessionid=9', FALSE, '/*?sessionid=', CAST(NULL AS DOUBLE)),
      |  ('/tmp/report.pdf', FALSE, '/tmp/*.pdf$', CAST(NULL AS DOUBLE)),
      |  ('/tmp/keepsake.pdf', FALSE, '/tmp/*.pdf$', CAST(NULL AS DOUBLE)),
      |  ('/tmp/keep/a.pdfz', TRUE, '/tmp/keep*', CAST(NULL AS DOUBLE)),
      |  ('/x/ay', TRUE, '/x/*y', CAST(NULL AS DOUBLE)),
      |  ('/x/ab', FALSE, '/x/a*', CAST(NULL AS DOUBLE)),
      |  ('/other', TRUE, CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE))
      |) AS t(path, allowed, matched_rule, crawl_delay)""".stripMargin

  // ---- sitemap discovery + ingestion, pinned -------------------------
  //
  // The robots `Sitemap:` directive → sitemap-index resolution →
  // urlset entry extraction chain, through the REAL parse operators
  // ([[Sitemaps]]) over files on disk: one sitemap is referenced BOTH
  // directly from robots and via the index (the distinct must collapse
  // it or every entry double-counts), one urlset entry carries an
  // entity-escaped query string, one a malformed lastmod and one a
  // malformed priority (untrusted fetched text degrades to NULL, never
  // fails the job), and a loc-less entry is dropped. DuckDB has no XML
  // machinery, so the oracle carries the closed-form rows (the pinned
  // pattern of q_robots_rules / q_robots_wildcards; SitemapsSpec gates
  // each parse branch locally first).

  private[graft] val SitemapFixtures: Seq[(String, String)] = Seq(
    "robots.txt" ->
      ("User-agent: *\n" +
        "Disallow: /private/\n" +
        "Sitemap: https://site.example/smindex.xml\n" +
        "# Sitemap: https://site.example/commented-out.xml\n" +
        "sitemap: https://site.example/sm2.xml\n"),
    "smindex.xml" ->
      ("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
        "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n" +
        "  <sitemap><loc>https://site.example/sm1.xml</loc>" +
        "<lastmod>2024-01-05</lastmod></sitemap>\n" +
        "  <sitemap>\n    <loc> https://site.example/sm2.xml </loc>\n" +
        "  </sitemap>\n" +
        "</sitemapindex>\n"),
    "sm1.xml" ->
      ("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
        "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n" +
        "  <url><loc>https://site.example/a</loc>" +
        "<lastmod>2024-03-01T12:30:00+00:00</lastmod>" +
        "<changefreq>daily</changefreq><priority>0.8</priority></url>\n" +
        "  <url>\n    <loc>https://site.example/p?x=1&amp;y=2</loc>\n" +
        "    <lastmod>garbage</lastmod>\n  </url>\n" +
        "  <url><priority>0.5</priority></url>\n" +
        "</urlset>\n"),
    "sm2.xml" ->
      ("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
        "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n" +
        "  <url><loc>https://site.example/b</loc>" +
        "<lastmod>2023-12-31</lastmod>" +
        "<priority>not-a-number</priority></url>\n" +
        "  <url><loc>https://other.example/c</loc></url>\n" +
        "</urlset>\n"))

  def sitemapIngest(s: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_q_sitemap_ingest")
    java.nio.file.Files.createDirectories(base)
    SitemapFixtures.foreach { case (name, body) =>
      java.nio.file.Files.write(base.resolve(name), body.getBytes("UTF-8"))
    }
    // the "fetched web": url -> document body, one row per file
    val docs = s.read.option("wholetext", "true").text(base.toString)
      .select(
        concat(lit("https://site.example/"),
          element_at(split(input_file_name(), "/"), -1)).as("url"),
        col("value").as("xml"))
    val seeds = docs.filter(col("url").endsWith("/robots.txt"))
      .select(explode(Sitemaps.sitemapsOf(col("xml"))).as("sm_url"))
    val fetched = seeds.join(docs, col("sm_url") === col("url"), "inner")
    val fromIndex = fetched.filter(Sitemaps.isSitemapIndex(col("xml")))
      .select(explode(Sitemaps.sitemapIndexLocs(col("xml"))).as("leaf_url"))
    val leafUrls = fetched.filter(!Sitemaps.isSitemapIndex(col("xml")))
      .select(col("sm_url").as("leaf_url"))
      .unionByName(fromIndex).distinct()
    val leaves = leafUrls.join(docs, col("leaf_url") === col("url"), "inner")
    leaves
      .select(
        element_at(split(col("leaf_url"), "/"), -1).as("sitemap"),
        explode(Sitemaps.sitemapEntries(col("xml"))).as("e"))
      .filter(col("e.loc").isNotNull)
      .select(
        col("sitemap"),
        col("e.loc").as("page"),
        graft.plans.NativeUrl.urlHost(col("e.loc")).as("host"),
        col("e.lastmod_ts").as("lastmod_ts"),
        col("e.changefreq").as("changefreq"),
        col("e.priority").as("priority"))
  }

  val sitemapIngestSql: String =
    """SELECT * FROM (VALUES
      |  ('sm1.xml', 'https://site.example/a', 'site.example',
      |    TIMESTAMP '2024-03-01 12:30:00', 'daily', 0.8),
      |  ('sm1.xml', 'https://site.example/p?x=1&y=2', 'site.example',
      |    CAST(NULL AS TIMESTAMP), CAST(NULL AS VARCHAR),
      |    CAST(NULL AS DOUBLE)),
      |  ('sm2.xml', 'https://site.example/b', 'site.example',
      |    TIMESTAMP '2023-12-31 00:00:00', CAST(NULL AS VARCHAR),
      |    CAST(NULL AS DOUBLE)),
      |  ('sm2.xml', 'https://other.example/c', 'other.example',
      |    CAST(NULL AS TIMESTAMP), CAST(NULL AS VARCHAR),
      |    CAST(NULL AS DOUBLE))
      |) AS t(sitemap, page, host, lastmod_ts, changefreq, priority)"""
      .stripMargin

  /** Recrawl planning — the freshness loop a production crawler runs
    * daily: per-domain sitemap XML is BUILT from the corpus (one
    * urlset per source, deterministic per-doc lastmod), parsed back
    * through the real [[Sitemaps.sitemapEntries]] kernel, and joined
    * against the stored crawl state (a [[VersionedTable]]-committed
    * last-crawled table read through a pinned manifest); a URL is due
    * when it was never crawled or its sitemap lastmod moved past the
    * stored crawl stamp. The oracle replays the closed form (the
    * parser itself is pinned by q_sitemap_ingest). Scale shape: the
    * XML build/parse is one map-only pass bounded by the protocol's
    * 50k-URL sitemap cap per row, the state join is an equi join on
    * url, and the rollup is one exchange.
    */
  def recrawlPlan(s: SparkSession, dir: String): DataFrame = {
    val root = StreamGateQueries.tempRoot("graft_q_recrawl_plan")
    val docs = t(s, dir, "documents").select("doc_id", "source")
    val url = concat(lit("https://"), col("source"),
      lit(".example/doc/"), col("doc_id").cast("string"))
    val lastmod = date_add(to_date(lit("2024-01-01")),
      (col("doc_id") % 90).cast("int"))
    // stored crawl state: two thirds of the corpus has been crawled
    VersionedTable.commit(
      docs.filter(col("doc_id") % 3 =!= 1)
        .select(url.as("url"),
          date_add(to_date(lit("2024-01-01")),
            (col("doc_id") % 60).cast("int")).cast("timestamp")
            .as("last_crawled")),
      root)
    val state = VersionedTable.read(s, root)
    // one urlset document per domain, entries carried as real XML
    val entryXml = concat(lit("<url><loc>"), url,
      lit("</loc><lastmod>"), date_format(lastmod, "yyyy-MM-dd"),
      lit("</lastmod></url>"))
    val sitemapXml = docs
      .select(col("source"), entryXml.as("e"))
      .groupBy("source")
      .agg(concat(lit("<urlset>"), concat_ws("", collect_list(col("e"))),
        lit("</urlset>")).as("xml"))
    val entries = sitemapXml
      .select(col("source"),
        explode(Sitemaps.sitemapEntries(col("xml"))).as("en"))
      .select(col("source"), col("en.loc").as("url"),
        col("en.lastmod_ts").as("lastmod_ts"))
    val due = coalesce(col("lastmod_ts") > col("last_crawled"), lit(true))
    entries.join(state, Seq("url"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_urls"),
        count(when(due, 1)).as("n_fetch"),
        min(when(due, col("lastmod_ts"))).as("first_due"),
        max(when(due, col("lastmod_ts"))).as("last_due"))
  }

  val recrawlPlanSql: String =
    """WITH e AS (
      |  SELECT doc_id, source,
      |    CAST(DATE '2024-01-01' + CAST(doc_id % 90 AS INTEGER)
      |      AS TIMESTAMP) AS lastmod_ts
      |  FROM documents),
      |st AS (SELECT doc_id,
      |    CAST(DATE '2024-01-01' + CAST(doc_id % 60 AS INTEGER)
      |      AS TIMESTAMP) AS last_crawled
      |  FROM documents WHERE doc_id % 3 <> 1),
      |plan AS (
      |  SELECT e.source, e.lastmod_ts,
      |    (st.doc_id IS NULL OR e.lastmod_ts > st.last_crawled) AS is_due
      |  FROM e LEFT JOIN st ON e.doc_id = st.doc_id)
      |SELECT source, count(*) AS n_urls,
      |  CAST(count(CASE WHEN is_due THEN 1 END) AS BIGINT) AS n_fetch,
      |  min(CASE WHEN is_due THEN lastmod_ts END) AS first_due,
      |  max(CASE WHEN is_due THEN lastmod_ts END) AS last_due
      |FROM plan GROUP BY source""".stripMargin

  // ---- deterministic per-domain robots text -------------------------
  //
  // Each registrable domain srcN.{com|co.uk} publishes a policy keyed
  // on N (the linkage-dirty-feed pattern: both engines know the
  // construction; the operator under audit is the parse + RFC
  // evaluation, which only the Spark side runs — the oracle replays
  // the EFFECTIVE semantics closed-form, honest because the parser
  // itself is pinned by q_robots_rules):
  //   N %% 5 == 0 → a graftbot-specific group disallowing everything
  //   N %% 3 == 0 → *: Disallow /doc/ but Allow /doc/2 (ids over 2…)
  //   N %% 3 == 1 → *: empty Disallow (allow all)
  //   N %% 3 == 2 → *: Disallow /private/ (matches nothing here)
  //   every * group: Crawl-delay (N %% 4) + 1 seconds

  private[graft] def domainN(domain: Column): Column =
    regexp_extract(domain, "([0-9]+)", 1).cast("long")

  private[graft] def robotsTxtFor(domain: Column): Column = {
    val n = domainN(domain)
    concat(
      when(n % 5 === 0,
        lit("User-agent: graftbot\nDisallow: /\n\n")).otherwise(lit("")),
      lit("User-agent: *\n"),
      lit("Crawl-delay: "), ((n % 4) + 1).cast("string"), lit("\n"),
      when(n % 3 === 0, lit("Disallow: /doc/\nAllow: /doc/2\n"))
        .when(n % 3 === 1, lit("Disallow:\n"))
        .otherwise(lit("Disallow: /private/\n")))
  }

  /** Parsed, per-domain rule table off the deterministic policy text —
    * |domains|-bounded (20 rows in, ≤ 5 rules each out), the shape a
    * real crawl holds broadcast after fetching every robots.txt once.
    */
  private[graft] def robotsRulesFor(domains: DataFrame): DataFrame =
    domains
      .withColumn("r", explode(Robots.robotsRules(
        robotsTxtFor(col("domain")))))
      .select(col("domain"), col("r.agent").as("agent"),
        col("r.rtype").as("rtype"), col("r.path").as("path"),
        col("r.delay").as("delay"))

  /** Every derived document URL gated as `graftbot` against its
    * domain's parsed policy: per-domain URL counts, allowed counts,
    * and the effective crawl delay. The rules ride a broadcast; the
    * URL side never shuffles before the final |domains|-bounded
    * rollup.
    */
  def robotsGate(s: SparkSession, dir: String): DataFrame = {
    val urls = WebQueries.docUrls(s, dir).select(
      col("doc_id"),
      UrlFunctions.registrableDomain(UrlFunctions.hostOf(col("url")))
        .as("domain"),
      regexp_extract(col("url"), "(/doc/[0-9]+)", 1).as("path"))
    val rules = robotsRulesFor(urls.select("domain").distinct())
    Robots.evaluate(urls, Robots.effectiveRules(rules, "graftbot"))
      .groupBy("domain")
      .agg(
        count(lit(1)).as("n_urls"),
        count(when(col("allowed"), 1)).as("n_allowed"),
        max(col("crawl_delay")).as("crawl_delay"))
  }

  val robotsGateSql: String =
    s"""WITH ${WebQueries.docUrlsCte},
      |h AS (SELECT doc_id, ${UrlFunctions.hostOfSql("url")} AS host
      |  FROM urls),
      |d AS (SELECT doc_id,
      |  ${UrlFunctions.registrableDomainSql("host")} AS domain FROM h),
      |g AS (SELECT doc_id, domain,
      |  CAST(regexp_extract(domain, '([0-9]+)', 1) AS BIGINT) AS n FROM d)
      |SELECT domain, count(*) AS n_urls,
      |  CAST(count(CASE WHEN n % 5 <> 0 AND (n % 3 <> 0 OR
      |    starts_with(CAST(doc_id AS VARCHAR), '2')) THEN 1 END) AS BIGINT)
      |    AS n_allowed,
      |  CASE WHEN max(n) % 5 = 0 THEN CAST(NULL AS DOUBLE)
      |    ELSE CAST((max(n) % 4) + 1 AS DOUBLE) END AS crawl_delay
      |FROM g GROUP BY domain""".stripMargin

  // ---- canonical-URL dedup ---------------------------------------------

  /** The FIRST dedup stage of any real crawl: the same page arrives
    * under many raw URLs (tracking params, fragments, case variants),
    * and collapsing on the CANONICAL form — before any content hashing
    * — removes refetch duplicates for the cost of one map-only rewrite
    * plus one keyed window. Fixture: every document URL arrives in two
    * raw variants (as-is, and with appended tracking params and a
    * fragment); both canonicalize identically, the window keeps the
    * lowest variant, and the per-domain rollup proves 2→1 collapse
    * with the kept-set fingerprint (sum of kept doc ids × variants).
    */
  def urlDedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = WebQueries.docUrls(s, dir).select("doc_id", "url")
    val variants = base.select(col("doc_id"), lit(0L).as("variant"),
        col("url"))
      .unionAll(base.select(col("doc_id"), lit(1L).as("variant"),
        concat(col("url"),
          when(col("url").contains("?"), lit("&gclid=x#ref"))
            .otherwise(lit("?utm_medium=social#ref"))).as("url")))
    val canon = variants
      .withColumn("canonical", UrlFunctions.canonicalizeUrl(col("url")))
      .withColumn("domain", UrlFunctions.registrableDomain(
        UrlFunctions.hostOf(col("url"))))
    val w = Window.partitionBy("canonical")
      .orderBy(col("variant"), col("doc_id"))
    canon
      .withColumn("_rn", row_number().over(w))
      .groupBy("domain")
      .agg(
        count(lit(1)).as("n_raw"),
        count(when(col("_rn") === 1, 1)).as("n_canonical"),
        sum(when(col("_rn") === 1, col("doc_id"))).as("kept_ids"),
        sum(when(col("_rn") === 1, col("variant"))).as("kept_variants"))
  }

  /** Both variants of a doc canonicalize identically, so per domain:
    * raw = 2×docs, canonical = docs, kept = variant-0 rows only.
    */
  val urlDedupSql: String =
    s"""WITH ${WebQueries.docUrlsCte},
      |h AS (SELECT doc_id, ${UrlFunctions.hostOfSql("url")} AS host
      |  FROM urls),
      |d AS (SELECT doc_id,
      |  ${UrlFunctions.registrableDomainSql("host")} AS domain FROM h)
      |SELECT domain, CAST(2 * count(*) AS BIGINT) AS n_raw,
      |  CAST(count(*) AS BIGINT) AS n_canonical,
      |  CAST(sum(doc_id) AS BIGINT) AS kept_ids,
      |  CAST(0 AS BIGINT) AS kept_variants
      |FROM d GROUP BY domain""".stripMargin

  // ---- the crawl frontier --------------------------------------------

  /** The next fetch wave, computed END-TO-END from raw segment bytes:
    * parse the shared 16-segment crawl fixture, walk every `<a href>`
    * ([[NativeHtml.htmlLinks]]), resolve host-relative `/doc/N` links
    * against the linking page's host, drop already-crawled targets
    * (anti-join on the documents table), gate the survivors against
    * each domain's parsed robots policy as `graftbot`, rank per host
    * by inlink count, and cap each host's wave at
    * `floor(12 / crawl_delay)` fetches — the politeness budget. At
    * 100 TB this is exactly the frontier job a production crawler
    * runs between waves: map-only parse, one distinct, one |frontier|
    * aggregate, a broadcast robots join and one bounded per-host
    * window.
    */
  def crawlFrontier(s: SparkSession, dir: String): DataFrame = {
    val segPath = WebQueries.crawlSegments(s, dir)
    val host = UrlFunctions.hostOf(col("url"))
    val edges = Warc.recordsStreamed(s, segPath)
      .filter(col("warc_type") === "response")
      .select(
        regexp_extract(col("url"), "/doc/([0-9]+)", 1).cast("long")
          .as("src"),
        host.as("host"),
        UrlFunctions.registrableDomain(host).as("domain"),
        explode(NativeHtml.htmlLinks(decode(col("body"), "UTF-8")))
          .as("href"))
      .filter(col("href").rlike("^/doc/[0-9]+$"))
      .select(col("src"), col("host"), col("domain"),
        regexp_extract(col("href"), "^/doc/([0-9]+)$", 1).cast("long")
          .as("dst"))
      .distinct()
    val candidates = edges
      .join(t(s, dir, "documents").select(col("doc_id")),
        col("dst") === col("doc_id"), "left_anti")
      .groupBy("host", "domain", "dst")
      .agg(count(lit(1)).as("indegree"))
      .withColumn("path", concat(lit("/doc/"), col("dst").cast("string")))
    val rules = robotsRulesFor(candidates.select("domain").distinct())
    val gated = Robots.evaluate(candidates,
        Robots.effectiveRules(rules, "graftbot"))
      .filter(col("allowed"))
    val w = Window.partitionBy("host")
      .orderBy(col("indegree").desc, col("dst"))
    gated
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= floor(lit(12.0) / col("crawl_delay")))
      .select("host", "dst", "indegree", "rank")
  }

  val crawlFrontierSql: String =
    s"""WITH ${WebQueries.docUrlsCte},
      |hh AS (SELECT doc_id, ${UrlFunctions.hostOfSql("url")} AS host
      |  FROM urls),
      |hd AS (SELECT doc_id,  host,
      |  ${UrlFunctions.registrableDomainSql("host")} AS domain FROM hh),
      |raw AS (
      |  SELECT doc_id AS src, host, domain, (doc_id*7+1) % 1000 AS dst
      |    FROM hd
      |  UNION
      |  SELECT doc_id, host, domain, (doc_id*13+3) % 1000 FROM hd),
      |deg AS (SELECT host, domain, dst, count(*) AS indegree FROM raw
      |  WHERE dst NOT IN (SELECT doc_id FROM documents)
      |  GROUP BY 1, 2, 3),
      |g AS (SELECT *,
      |  CAST(regexp_extract(domain, '([0-9]+)', 1) AS BIGINT) AS n FROM deg),
      |allowed AS (SELECT * FROM g WHERE n % 5 <> 0 AND (n % 3 <> 0 OR
      |  starts_with(CAST(dst AS VARCHAR), '2'))),
      |ranked AS (SELECT host, dst, indegree,
      |  row_number() OVER (PARTITION BY host
      |    ORDER BY indegree DESC, dst) AS rnk,
      |  (n % 4) + 1 AS delay FROM allowed)
      |SELECT host, dst, CAST(indegree AS BIGINT) AS indegree,
      |  CAST(rnk AS BIGINT) AS rank
      |FROM ranked WHERE rnk <= floor(12.0 / delay)""".stripMargin
}
