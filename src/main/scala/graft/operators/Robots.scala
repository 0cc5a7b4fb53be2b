package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robots Exclusion Protocol (RFC 9309) for the crawl pipeline: parse
  * `robots.txt` text into a rule table and evaluate URL paths against
  * it with the standard longest-match semantics. The crawl frontier
  * consumes this to drop politeness-excluded URLs BEFORE they are
  * fetched — at 100 TB crawl scale the gate runs as a broadcast join
  * against a |domains × rules|-bounded table, never per-byte work.
  *
  * Path matching implements the full RFC 9309 §2.2.3 pattern language
  * — implicit start anchor, `*` matching any character run, trailing
  * `$` anchoring the pattern end — via the codegen'd
  * [[graft.plans.NativeRobots]] kernel (per-row rule patterns would
  * recompile a regex per row through Catalyst's `Like`). Group
  * selection and precedence follow the RFC: the most specific matching
  * user-agent group is used EXCLUSIVELY (fall back to `*` only when no
  * specific group exists), the most-octets matching rule pattern wins,
  * Allow beats Disallow on ties, no matching rule means allowed, and
  * an empty-path rule is a no-op.
  */
object Robots {

  /** Parse robots.txt text into
    * `array<struct<agent, rtype, path, delay>>` — one row per
    * (group-agent × rule), `rtype ∈ allow | disallow | crawl-delay`
    * (delay carries the parsed seconds, path empty). Pure builtin
    * fold (`aggregate` over the split lines — codegen'd, no UDF):
    *
    *   - comments (`#` to end of line) and blank lines are stripped;
    *   - consecutive `User-agent:` lines accumulate onto one group; a
    *     `User-agent:` after rules STARTS A NEW group (RFC grouping);
    *   - `Allow:` / `Disallow:` / `Crawl-delay:` emit one entry per
    *     agent of the current group; unknown directives and naked
    *     lines are ignored;
    *   - agent names lowercase; field names case-insensitive; CRLF
    *     tolerated.
    */
  def robotsRules(txt: Column): Column = {
    val ruleT =
      "array<struct<agent:string,rtype:string,path:string,delay:double>>"
    // comment-strip + trim, then split each line into (key, value)
    val lines = transform(split(txt, "\\r?\\n"),
      raw => trim(element_at(split(raw, "#"), 1)))
    val kvs = transform(lines, line => {
      val hasColon = instr(line, ":") > 0
      struct(
        when(hasColon, lower(trim(substring_index(line, ":", 1))))
          .otherwise("").as("key"),
        when(hasColon, trim(col_substr(line, instr(line, ":") + 1)))
          .otherwise("").as("value"))
    })
    // fold with a (agents, started, rules) accumulator; `started`
    // marks that the current group already emitted rules, so the next
    // User-agent line OPENS A NEW group instead of extending this one
    def mkAcc(agents: Column, started: Column, rules: Column): Column =
      struct(agents.as("agents"), started.as("started"), rules.as("rules"))
    def mkRules(acc: Column, kv: Column, rtype: Column, path: Column,
        delay: Column): Column =
      concat(acc.getField("rules"), transform(acc.getField("agents"),
        a => struct(a.as("agent"), rtype.as("rtype"), path.as("path"),
          delay.as("delay"))))
    aggregate(
      kvs,
      mkAcc(array().cast("array<string>"), lit(false),
        array().cast(ruleT)),
      (acc, kv) => {
        val key = kv.getField("key")
        val value = kv.getField("value")
        val agents = acc.getField("agents")
        val started = acc.getField("started")
        when(key === "user-agent" && value =!= "",
          mkAcc(
            when(started, array(lower(value)))
              .otherwise(array_append(agents, lower(value))),
            lit(false), acc.getField("rules")))
        .when((key === "allow" || key === "disallow") && size(agents) > 0,
          mkAcc(agents, lit(true),
            mkRules(acc, kv, key, value, lit(null).cast("double"))))
        // try_cast: the value is untrusted fetched text and the real
        // web writes "Crawl-delay: 1s" — under ANSI mode a plain cast
        // would fail the whole job on one malformed line; the contract
        // is that garbage degrades to "no delay"
        .when(key === "crawl-delay" && size(agents) > 0,
          mkAcc(agents, lit(true),
            mkRules(acc, kv, key, lit(""), value.try_cast("double"))))
        .otherwise(acc)
      },
      acc => acc.getField("rules"))
  }

  /** `substring(str, pos)` to end-of-string with a Column pos (the
    * functions API only exposes fixed-length overloads).
    */
  private def col_substr(str: Column, pos: Column): Column =
    str.substr(pos, length(str))

  /** Effective (allow|disallow) rules and crawl delays for `agent`,
    * per domain, from an exploded rule table with columns
    * `(domain, agent, rtype, path, delay)`: RFC group selection — the
    * agent's own group REPLACES the `*` group wherever it exists.
    * Output: `(domain, rtype, path, delay)`, empty-path allow/disallow
    * rules dropped (no-ops), ready to broadcast into [[evaluate]].
    */
  def effectiveRules(rules: DataFrame, agent: String): DataFrame = {
    val a = lit(agent.toLowerCase)
    val hasSpecific = max(when(col("agent") === a, 1).otherwise(0))
      .over(Window.partitionBy("domain"))
    rules
      .withColumn("_has_specific", hasSpecific)
      .filter(
        (col("_has_specific") === 1 && col("agent") === a) ||
          (col("_has_specific") === 0 && col("agent") === "*"))
      .filter(col("rtype") === "crawl-delay" || col("path") =!= "")
      .select("domain", "rtype", "path", "delay")
  }

  /** Gate `urls` (must carry `domain` and `path` columns) against the
    * [[effectiveRules]] table: RFC 9309 pattern match (`*` / trailing
    * `$` interpreted, implicit prefix otherwise) with most-octets
    * precedence — the longest matching rule PATTERN wins (wildcards
    * count as octets, the RFC's "most specific match" rule as
    * implemented by the reference Google matcher) — and `allow` beats
    * `disallow` on equal length; no match → allowed. Appends `allowed`
    * (boolean), `matched_rule` (the winning rule path, NULL when none)
    * and `crawl_delay` (seconds, NULL when unset).
    *
    * Scale shape: the rules fold into ONE array row per domain
    * (|rules per domain| is tens at most for real policies) and ride
    * a broadcast; each URL picks its winner with a per-row
    * filter + sort over that array — the URL side NEVER shuffles, and
    * there is no per-URL window (a row_number over a synthetic row id
    * would repartition the whole frontier just to rank ≤ tens of
    * matches).
    */
  def evaluate(urls: DataFrame, effective: DataFrame): DataFrame = {
    val byDomain = effective
      .groupBy(col("domain").as("_r_domain"))
      .agg(
        collect_list(when(col("rtype") =!= "crawl-delay",
          struct(col("rtype").as("rtype"), col("path").as("path"))))
          .as("_r_rules"),
        max(when(col("rtype") === "crawl-delay", col("delay")))
          .as("crawl_delay"))
    val matches = filter(col("_r_rules"),
      r => graft.plans.NativeRobots.robotsMatch(
        col("path"), r.getField("path")))
    // longest path first; 'allow' < 'disallow' lexically, so the
    // ascending rtype comparison breaks equal-length ties toward allow
    // get() is 0-based and NULL out-of-bounds regardless of ANSI mode
    val best = get(array_sort(matches, (l, r) =>
      when(length(l.getField("path")) > length(r.getField("path")), -1)
        .when(length(l.getField("path")) < length(r.getField("path")), 1)
        .when(l.getField("rtype") < r.getField("rtype"), -1)
        .when(l.getField("rtype") > r.getField("rtype"), 1)
        .otherwise(0)), lit(0))
    urls.join(broadcast(byDomain), col("domain") === col("_r_domain"), "left")
      .withColumn("_best", best)
      .withColumn("allowed",
        col("_best").isNull || col("_best.rtype") === "allow")
      .withColumn("matched_rule", col("_best.path"))
      .drop("_r_domain", "_r_rules", "_best")
  }
}
