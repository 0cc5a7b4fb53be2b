package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Robots

/** RFC 9309 gates: the robots.txt line fold (groups, comments, CRLF,
  * unknown directives, multi-agent groups, crawl-delay), group
  * selection (specific agent replaces `*` EXCLUSIVELY), and the
  * longest-match / allow-wins-ties / default-allow evaluation.
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val fixture =
    "# policy file\r\n" +
      "User-agent: graftbot\n" +
      "User-agent: otherbot # trailing comment\n" +
      "Disallow: /private/\n" +
      "Allow: /private/ok\n" +
      "Crawl-delay: 2.5\n" +
      "\n" +
      "User-agent: *\n" +
      "Disallow: /tmp/\n" +
      "Disallow:\n" + // empty path: a no-op rule
      "Unknown-directive: xyz\n" +
      "naked line without colon\n" +
      "User-agent: latebot\n" + // after rules => NEW group
      "Disallow: /\n"

  private def parsed = Seq(fixture).toDF("txt")
    .select(explode(Robots.robotsRules(col("txt"))).as("r"))
    .select("r.agent", "r.rtype", "r.path", "r.delay")

  test("the line fold produces one entry per (group agent x rule)") {
    val rows = parsed.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]).getOrElse(-1.0))).toSeq
    assert(rows === Seq(
      ("graftbot", "disallow", "/private/", -1.0),
      ("otherbot", "disallow", "/private/", -1.0),
      ("graftbot", "allow", "/private/ok", -1.0),
      ("otherbot", "allow", "/private/ok", -1.0),
      ("graftbot", "crawl-delay", "", 2.5),
      ("otherbot", "crawl-delay", "", 2.5),
      ("*", "disallow", "/tmp/", -1.0),
      ("*", "disallow", "", -1.0), // kept by the parser, dropped at eval
      ("latebot", "disallow", "/", -1.0)))
  }

  test("rules before any user-agent line are dropped; empty text parses empty") {
    val orphan = Seq("Disallow: /x\nUser-agent: *\nAllow: /y\n").toDF("txt")
      .select(explode(Robots.robotsRules(col("txt"))).as("r"))
      .select("r.agent", "r.rtype").as[(String, String)].collect().toSeq
    assert(orphan === Seq(("*", "allow")))
    assert(Seq("").toDF("txt")
      .select(size(Robots.robotsRules(col("txt"))).as("n"))
      .head().getInt(0) === 0)
  }

  private def rulesDf = parsed.withColumn("domain", lit("example.com"))

  test("group selection: a specific agent's group REPLACES the * group") {
    val forGraft = Robots.effectiveRules(rulesDf, "GraftBot")
      .select("rtype", "path").as[(String, String)].collect().toSeq.sorted
    // only the graftbot group's rules; the * group's /tmp/ is absent
    assert(forGraft === Seq(("allow", "/private/ok"), ("crawl-delay", ""),
      ("disallow", "/private/")))
    val forNobody = Robots.effectiveRules(rulesDf, "randombot")
      .select("rtype", "path").as[(String, String)].collect().toSeq
    // falls back to *; the empty-path no-op is dropped
    assert(forNobody === Seq(("disallow", "/tmp/")))
  }

  test("evaluation: longest match wins, allow beats disallow on ties, default allow") {
    val urls = Seq(
      ("example.com", "/private/secret"), // disallowed by /private/
      ("example.com", "/private/ok/page"), // allowed: longer allow rule
      ("example.com", "/public/x"), // no match: default allow
      ("other.org", "/private/secret") // no rules for this domain at all
    ).toDF("domain", "path")
    val out = Robots.evaluate(urls,
      Robots.effectiveRules(rulesDf, "graftbot"))
      .select("domain", "path", "allowed", "matched_rule", "crawl_delay")
      .collect().map(r => (r.getString(1), r.getBoolean(2),
        Option(r.get(3)).orNull, Option(r.get(4)).orNull)).toSeq
      .sortBy(_._1)
    assert(out === Seq(
      ("/private/ok/page", true, "/private/ok", 2.5),
      ("/private/secret", false, "/private/", 2.5),
      ("/private/secret", true, null, null), // other.org: no rules
      ("/public/x", true, null, 2.5)))
  }

  test("RFC 9309 pattern matcher: *, trailing $, literal mid-pattern $") {
    import graft.plans.NativeRobots.robotsMatchEval
    def m(path: String, pat: String): Boolean =
      robotsMatchEval(
        org.apache.spark.unsafe.types.UTF8String.fromString(path),
        org.apache.spark.unsafe.types.UTF8String.fromString(pat))
    // plain prefix (implicit open end)
    assert(m("/doc/123", "/doc/"))
    assert(!m("/doc", "/doc/"))
    // mid-pattern star, the RFC's canonical example shape
    assert(m("/doc/1?sessionid=abc", "/*?sessionid="))
    assert(!m("/doc/1?session=abc", "/*?sessionid="))
    // trailing $ anchors the end
    assert(m("/report.pdf", "/*.pdf$"))
    assert(!m("/report.pdfz", "/*.pdf$"))
    assert(m("/a.pdf.pdf", "/*.pdf$")) // backtrack to the LAST .pdf
    // star matches the empty run
    assert(m("/ab", "/a*b"))
    assert(m("/aXYZb", "/a*b"))
    // multiple stars
    assert(m("/aXbYc", "/a*b*c"))
    assert(!m("/aXbY", "/a*b*c"))
    // $ not at the end is a literal
    assert(m("/pa$th/x", "/pa$th"))
    assert(!m("/path/x", "/pa$th"))
    // bare "$" matches only the empty path; "*$" matches everything
    assert(!m("/x", "$"))
    assert(m("", "$"))
    assert(m("/anything", "*$"))
    // trailing star is redundant but legal
    assert(m("/doc/5", "/doc/*"))
    // nulls never match
    assert(!robotsMatchEval(null,
      org.apache.spark.unsafe.types.UTF8String.fromString("/")))
  }

  test("evaluation with wildcard rules: most-octets precedence, $ anchors") {
    val rules = Seq(
      ("w.com", "*", "disallow", "/*?sessionid=", null),
      ("w.com", "*", "allow", "/doc/*$", null),
      ("w.com", "*", "disallow", "/doc/", null),
      ("w.com", "*", "disallow", "/tmp/*.pdf$", null),
      ("w.com", "*", "allow", "/tmp/keep*", null))
      .map { case (d, a, r, p, _) =>
        (d, a, r, p, null.asInstanceOf[java.lang.Double]) }
      .toDF("domain", "agent", "rtype", "path", "delay")
    val urls = Seq(
      ("w.com", "/doc/123"), // allow /doc/*$ (7) beats disallow /doc/ (5)
      ("w.com", "/doc/1?sessionid=a"), // disallow (13) beats allow (7)
      ("w.com", "/tmp/report.pdf"), // disallow /tmp/*.pdf$ only
      ("w.com", "/tmp/keepsake.pdf"), // disallow (11) beats allow (10)
      ("w.com", "/tmp/keep/a.pdfz") // $ fails on disallow; allow matches
    ).toDF("domain", "path")
    val out = Robots.evaluate(urls, Robots.effectiveRules(rules, "graftbot"))
      .select("path", "allowed", "matched_rule")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2)))
      .toSeq.sortBy(_._1)
    assert(out === Seq(
      ("/doc/123", true, "/doc/*$"),
      ("/doc/1?sessionid=a", false, "/*?sessionid="),
      ("/tmp/keep/a.pdfz", true, "/tmp/keep*"),
      ("/tmp/keepsake.pdf", false, "/tmp/*.pdf$"),
      ("/tmp/report.pdf", false, "/tmp/*.pdf$")))
  }

  test("malformed crawl-delay degrades to null instead of failing (ANSI)") {
    val txt = "User-agent: *\nCrawl-delay: 1s\nDisallow: /x\n"
    val rows = Seq(txt).toDF("txt")
      .select(explode(Robots.robotsRules(col("txt"))).as("r"))
      .select("r.rtype", "r.delay")
      .collect().map(r => (r.getString(0), Option(r.get(1)))).toSeq
    assert(rows === Seq(("crawl-delay", None), ("disallow", None)))
  }

  test("allow/disallow tie at equal length: allow wins") {
    val rules = Seq(
      ("d.com", "*", "allow", "/a/", null.asInstanceOf[java.lang.Double]),
      ("d.com", "*", "disallow", "/a/", null.asInstanceOf[java.lang.Double]))
      .toDF("domain", "agent", "rtype", "path", "delay")
    val out = Robots.evaluate(
      Seq(("d.com", "/a/x")).toDF("domain", "path"),
      Robots.effectiveRules(rules, "anybot"))
    assert(out.select("allowed").head().getBoolean(0))
  }
}
