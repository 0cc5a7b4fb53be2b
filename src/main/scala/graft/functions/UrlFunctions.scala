package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + registrable-domain rollup — the operator
  * between a raw crawl and every per-source curation query: source
  * caps, mixture plans and overlap audits key on a clean `source`
  * column, and on a real crawl that column IS the registrable domain
  * of a canonicalized URL. Without canonicalization the same page
  * counts as many sources (`HTTP://WWW.X.COM:80/p?utm_a=1#top` vs
  * `http://www.x.com/p`), and per-domain quotas silently leak.
  *
  * The CONTRACT (each step a deterministic string rewrite, expressed
  * twice from the SAME constants — Spark `Column`s here, DuckDB SQL in
  * the `*Sql` twins, both engines' regexes RE2-safe and single-match
  * so the `regexp_replace` all-vs-first dialect difference can never
  * show):
  *
  *   1. trim; a value without a `scheme://` prefix canonicalizes to
  *      NULL (relative and garbage URLs are the caller's quarantine);
  *   2. scheme and host lowercase; userinfo (`user:pass@`) drops;
  *   3. default ports drop (`:80` for http, `:443` for https; other
  *      ports survive);
  *   4. the fragment drops; tracking parameters
  *      ([[UrlFunctions.TrackingParams]]: utm_*, gclid, fbclid, …)
  *      drop from the query string; a query emptied by the strip
  *      loses its `?`;
  *   5. an empty path becomes `/`.
  *
  * Registrable domain: the eTLD+1 under a bundled minimal
  * public-suffix table ([[UrlFunctions.MultiSuffixes]] — the common
  * two-label suffixes; unlisted hosts fall back to the last two
  * labels; bare IPv4s and dotless hosts roll up as themselves). The
  * table is deliberately a SMALL pinned constant: the full PSL churns
  * weekly and a 100 TB run wants a versioned, auditable rollup key,
  * not a moving target — extend the one Seq to widen it (both the
  * Column chain and the SQL CASE chain are generated from it).
  *
  * Scale shape: every function here is a pure per-row projection over
  * Spark's codegen'd string builtins — map-only, no UDF boundary, no
  * shuffle; a 100 TB canonicalization is exactly as parallel as its
  * scan.
  */
object UrlFunctions {

  /** Query parameters stripped by canonicalization (anchored regex
    * alternatives over the param name).
    */
  val TrackingParams: Seq[String] = Seq(
    "utm_[A-Za-z0-9]+", "gclid", "fbclid", "msclkid", "yclid", "mc_eid",
    "igshid", "spm", "ref", "ref_src", "_ga", "_gl")

  /** Bundled two-label public suffixes (registrable domain = one more
    * label). Pinned, versioned-by-commit subset of the PSL's most
    * common entries.
    */
  val MultiSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "co.in", "net.in", "org.in",
    "co.kr", "or.kr", "co.za", "com.sg", "com.hk", "com.tw",
    "co.nz", "net.nz", "org.nz", "com.my", "co.id", "co.th",
    "com.vn", "com.ua", "co.il", "com.eg", "com.sa", "com.pk",
    "com.ng", "co.ke")

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val TrackRe = s"^(${TrackingParams.mkString("|")})(=|$$)"

  // ---- Spark side -------------------------------------------------

  /** Lowercased host of an absolute URL (userinfo and port stripped);
    * '' when the input has no `scheme://` prefix. Delegates to the
    * single-pass [[graft.plans.NativeUrl]] kernel (the regex chain is
    * kept as [[hostOfComposed]] for the differential gate).
    */
  def hostOf(url: Column): Column =
    graft.plans.NativeUrl.urlHost(url)

  /** The original regex-composed formulation of [[hostOf]] — retained
    * ONLY as the differential oracle for the native kernel
    * (UrlFunctionsSpec asserts kernel == chain over the adversarial
    * fixture corpus); production call sites use the kernel.
    */
  private[graft] def hostOfComposed(url: Column): Column = {
    val u = trim(url)
    val auth = regexp_extract(
      regexp_replace(u, SchemeRe, ""), "^([^/?#]*)", 1)
    when(u.rlike(SchemeRe),
      lower(regexp_extract(
        regexp_replace(auth, "^[^@]*@", ""), "^([^:]*)", 1)))
      .otherwise(lit(""))
  }

  /** Canonical form of an absolute URL per the object contract; NULL
    * for inputs without a `scheme://` prefix. Delegates to the
    * single-pass [[graft.plans.NativeUrl]] kernel — the ~8-pass regex
    * chain below ([[canonicalizeUrlComposed]]) was the costliest
    * map-only projection in the bench sweep and is retained only as
    * the kernel's differential oracle.
    */
  def canonicalizeUrl(url: Column): Column =
    graft.plans.NativeUrl.canonicalUrl(url)

  /** Regex-composed twin of [[canonicalizeUrl]], for the differential
    * gate only.
    */
  private[graft] def canonicalizeUrlComposed(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, SchemeRe, 1))
    val rest = regexp_replace(u, SchemeRe, "")
    val auth = regexp_extract(rest, "^([^/?#]*)", 1)
    val hostPort = lower(regexp_replace(auth, "^[^@]*@", ""))
    val host = regexp_extract(hostPort, "^([^:]*)", 1)
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val pq = regexp_replace(
      rest.substr(length(auth) + 1, lit(1000000)), "#.*$", "")
    val path = regexp_extract(pq, "^([^?]*)", 1)
    val rawQuery = when(pq.contains("?"),
      regexp_replace(pq, "^[^?]*\\?", "")).otherwise(lit(""))
    val query = array_join(
      filter(split(rawQuery, "&"),
        p => p =!= "" && !p.rlike(TrackRe)), "&")
    when(scheme === "", lit(null).cast("string")).otherwise(concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      when(path === "", lit("/")).otherwise(path),
      when(query === "", lit("")).otherwise(concat(lit("?"), query))))
  }

  /** Registrable domain (eTLD+1) of a lowercase host: multi-label
    * suffix hit → last three labels; fallback → last two; IPv4 or
    * dotless host → itself. Delegates to the native
    * [[graft.plans.NativeUrl]] kernel — a Column `when`-chain over
    * the suffix table re-inlines the host subtree per branch and
    * falls off the janino codegen cliff (see that object's doc).
    */
  def registrableDomain(host: Column): Column =
    graft.plans.NativeUrl.registrableDomain(host)

  // ---- DuckDB twins (the SAME constants interpolated) -------------

  def hostOfSql(e: String): String = {
    val u = s"trim($e)"
    val rest = s"regexp_replace($u, '$SchemeRe', '')"
    val auth = s"regexp_extract($rest, '^([^/?#]*)', 1)"
    val h = s"lower(regexp_extract(regexp_replace($auth, '^[^@]*@', ''), '^([^:]*)', 1))"
    s"CASE WHEN regexp_matches($u, '$SchemeRe') THEN $h ELSE '' END"
  }

  def canonicalizeUrlSql(e: String): String = {
    val u = s"trim($e)"
    val scheme = s"lower(regexp_extract($u, '$SchemeRe', 1))"
    val rest = s"regexp_replace($u, '$SchemeRe', '')"
    val auth = s"regexp_extract($rest, '^([^/?#]*)', 1)"
    val hostPort = s"lower(regexp_replace($auth, '^[^@]*@', ''))"
    val host = s"regexp_extract($hostPort, '^([^:]*)', 1)"
    val port = s"regexp_extract($hostPort, ':([0-9]+)$$', 1)"
    val keepPort = s"($port != '' AND NOT ($scheme = 'http' AND $port = '80')" +
      s" AND NOT ($scheme = 'https' AND $port = '443'))"
    val pq = s"regexp_replace(substr($rest, length($auth) + 1), '#.*$$', '')"
    val path = s"regexp_extract($pq, '^([^?]*)', 1)"
    val rawQuery = s"(CASE WHEN contains($pq, '?') " +
      s"THEN regexp_replace($pq, '^[^?]*\\?', '') ELSE '' END)"
    // coalesce: DuckDB's array_to_string of an EMPTY list is NULL
    // where Spark's array_join is '' — the one dialect gap in this chain
    val query = s"coalesce(array_to_string(list_filter(string_split($rawQuery, '&'), " +
      s"p -> p != '' AND NOT regexp_matches(p, '$TrackRe')), '&'), '')"
    s"""CASE WHEN $scheme = '' THEN NULL ELSE
       |  $scheme || '://' || $host ||
       |  (CASE WHEN $keepPort THEN ':' || $port ELSE '' END) ||
       |  (CASE WHEN $path = '' THEN '/' ELSE $path END) ||
       |  (CASE WHEN $query = '' THEN '' ELSE '?' || $query END)
       |END""".stripMargin
  }

  def registrableDomainSql(e: String): String = {
    val generic = s"regexp_extract($e, '([^.]+\\.[^.]+)$$', 1)"
    val cases = MultiSuffixes.map { suf =>
      val esc = suf.replace(".", "\\.")
      s"WHEN ends_with($e, '.$suf') THEN regexp_extract($e, '([^.]+\\.$esc)$$', 1)"
    }.mkString("\n    ")
    s"""CASE WHEN regexp_matches($e, '^[0-9.]+$$') OR NOT contains($e, '.') THEN $e
       |    $cases
       |    ELSE $generic END""".stripMargin
  }
}
