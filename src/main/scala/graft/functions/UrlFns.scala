package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable Column combinators for URL decomposition and host
  * validation — the Spark-first re-expression of the reference's
  * imperative parser (kris-dev-hub/globallinks pkg/commoncrawl/
  * wat.go:623-678 buildURLRecord, :561-620 verifyRecordQuality,
  * :953-962 genSubdomain). Everything is built from codegen'd
  * built-ins (regexp_extract / rlike / substr): no UDFs, so the
  * expressions inline into WholeStageCodegen and push into scans
  * where Catalyst allows.
  */
object UrlFns {

  /** Protocol-relative `//host/path` links resolve as https (the
    * reference normalizes them before parsing, wat.go:509-512).
    */
  def normalizeUrl(u: Column): Column =
    when(u.startsWith("//"), concat(lit("https:"), u)).otherwise(u)

  def urlScheme(u: Column): Column =
    regexp_extract(u, "^([a-z][a-z0-9+.-]*)://", 1)

  def urlHost(u: Column): Column =
    lower(regexp_extract(u, "^[a-z][a-z0-9+.-]*://([^/?#:]+)", 1))

  def urlPath(u: Column): Column =
    regexp_extract(u, "^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)", 1)

  /** Query = text between the FIRST '?' and the fragment. `[^#?]*`
    * before the '?' keeps a '?' that appears inside the fragment
    * (e.g. `/page#sec?x=1`) from inventing a query (RFC 3986: the
    * fragment starts at the first '#').
    */
  def urlRawQuery(u: Column): Column =
    regexp_extract(u, "^[^#?]*[?]([^#]*)", 1)

  /** Scheme stored as the reference's compact code: http→"1",
    * https→"2", anything else→"0" (wat.go setScheme; TestSetScheme).
    */
  def schemeCode(scheme: Column): Column =
    when(scheme === "http", lit("1"))
      .when(scheme === "https", lit("2"))
      .otherwise(lit("0"))

  /** URLs with ASCII control characters are invalid (Go url.Parse
    * rejects ALL of them, not just whitespace; TestBuildURLRecord
    * "Contains New Line").
    */
  def isParseableUrl(u: Column): Column = !u.rlike("[\\x00-\\x1f]")

  /** verifyRecordQuality's query gates (wat.go:582-590): over 200 BYTES
    * (Go len() counts bytes) is garbage; '|' collides with the
    * reference's pipe-delimited file format.
    */
  def isQualityQuery(q: Column): Column =
    octet_length(q) <= 200 && !q.contains("|")

  /** Empty path normalizes to "/" at record build time (wat.go:646-648)
    * so `http://e.com` and `http://e.com/` compact as one record.
    */
  def normalizePath(p: Column): Column =
    when(p === "", lit("/")).otherwise(p)

  def urlFragment(u: Column): Column = regexp_extract(u, "#(.*)$", 1)

  /** Blocked TLD suffixes (config.go IgnoreTLD). */
  val IgnoreTld: Seq[String] = Seq(".cn", ".blogspot.com")

  def hasIgnoredTld(domain: Column): Column =
    IgnoreTld.map(t => lower(domain).endsWith(t): Column).reduce(_ || _)

  /** Tracking-ish query prefixes are cleared to "" rather than the
    * link dropped (wat.go:653-655; config.go IgnoreQuery).
    */
  val IgnoreQueryPrefixes: Seq[String] = Seq("lang", "utm_", "ref")

  def cleanQuery(q: Column): Column =
    when(IgnoreQueryPrefixes.map(p => q.startsWith(p): Column).reduce(_ || _), lit(""))
      .otherwise(q)

  /** eTLD+1 of a host via the FULL embedded public-suffix table:
    * `a.b.example.co.uk` → `example.co.uk`, `x.user.github.io` →
    * `user.github.io` (private suffixes included, like Go's
    * publicsuffix.EffectiveTLDPlusOne). NULL when the host is itself a
    * public suffix. See [[PublicSuffixList]] / [[Etld1]].
    */
  def etld1(h: Column): Column = Etld1.of(h)

  /** Subdomain = host minus ".eTLD+1" (reference genSubdomain). */
  def subdomainOf(h: Column, e: Column): Column =
    when(e.isNotNull && length(h) > length(e),
      h.substr(lit(1), length(h) - length(e) - 1))
      .otherwise(lit(""))

  /** Scala-side eTLD+1 split, for driver-side request parsing (the
    * LinkDb API receives one domain string per request).
    */
  def splitDomain(host: String): (String, String) =
    PublicSuffixList.splitDomain(host)

  val IpRegex: String =
    "^(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9][0-9]|[0-9])([.](25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9][0-9]|[0-9])){3}$"
  val DomainRegex: String =
    "^([a-z0-9]([a-z0-9-]{0,61}[a-z0-9])?[.])+[a-z]{2,}$"

  def isIpHost(h: Column): Column = h.rlike(IpRegex)

  /** Host quality gate (wat.go:561-620): has a dot, is not a bare IP,
    * matches the hostname grammar.
    */
  def isValidHost(h: Column): Column =
    h.contains(".") && !isIpHost(h) && lower(h).rlike(DomainRegex)

  /** File extensions the importer drops links to (config.go ignore list
    * — assets, not documents).
    */
  val IgnoredExtensions: Seq[String] = Seq(
    ".jpg", ".jpeg", ".png", ".gif", ".webp", ".svg", ".ico", ".css",
    ".js", ".pdf", ".zip", ".gz", ".mp3", ".mp4", ".avi", ".woff",
    ".woff2", ".ttf", ".xml", ".rss")

  def hasIgnoredExtension(path: Column): Column =
    IgnoredExtensions
      .map(e => lower(path).endsWith(e): Column)
      .reduce(_ || _)
}
