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
