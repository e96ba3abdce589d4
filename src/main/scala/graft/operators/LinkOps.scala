package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2B — the reference's link-pipeline semantics, Spark-first.
  *
  * Reference: kris-dev-hub/globallinks pkg/commoncrawl/wat.go (extract +
  * quality filters), cmd/importer/main.go:567-609 (aggressive
  * compaction), pkg/linkdb/controller.go:22-237 (LinkDB query + merge).
  */
object LinkOps {

  /** JSON metadata extraction — the WAT-payload read re-expressed as a
    * codegen'd `get_json_object` over the events table (wat.go:404-431).
    */
  val q15_json_extract: GraftQuery = GraftQuery(
    "q15_json_extract",
    (s, dir) =>
      Tables.table(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k")),
    Some("""SELECT event_type,
           |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           |  COUNT(*) AS n,
           |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
           |FROM events GROUP BY event_type""".stripMargin)
  )

  /** Gap-based sessionization (30-min inactivity) via two windows over
    * the same (user_id, ts) partitioning — one shuffle total.
    */
  val q16_sessionize: GraftQuery = GraftQuery(
    "q16_sessionize",
    (s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.table(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTE"), 1L).otherwise(0L))
        .withColumn("sess_id", sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("n_events"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).as("n_events"),
          max(col("n_events")).as("max_session_events"))
    },
    Some("""SELECT user_id, COUNT(*) AS n_sessions,
           |  CAST(SUM(n_events) AS BIGINT) AS n_events,
           |  MAX(n_events) AS max_session_events
           |FROM (
           |  SELECT user_id, sess_id, COUNT(*) AS n_events
           |  FROM (
           |    SELECT user_id, event_id,
           |      SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |                          ROWS UNBOUNDED PRECEDING) AS sess_id
           |    FROM (
           |      SELECT user_id, ts, event_id,
           |        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
           |               OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           |                    + INTERVAL 30 MINUTE
           |             THEN 1 ELSE 0 END AS new_sess
           |      FROM events) a) b
           |  GROUP BY user_id, sess_id) c
           |GROUP BY user_id""".stripMargin)
  )

  // DuckDB-side mirrors of LinkCompaction.variantKey / lineKey
  private val variantKeySql =
    "lpad(CAST(length(page_path) AS VARCHAR), 4, '0') || " +
      "lpad(CAST(length(page_rawquery) AS VARCHAR), 4, '0') || page_path || '|' || page_rawquery"
  private val lineKeySql =
    "page_path || '|' || page_rawquery || '|' || link_text || '|' || date_from || '|' || ip"

  /** Aggressive compaction (importer/main.go:567-609): see
    * [[LinkCompaction.compact]] — one hash aggregate, map-side partial
    * agg, single shuffle at any scale; no window functions needed.
    */
  val q17_compact_links: GraftQuery = GraftQuery(
    "q17_compact_links",
    (s, dir) => LinkCompaction.compact(Tables.links(s, dir)),
    Some(Tables.linksCte +
      s"""SELECT link_domain, link_subdomain, link_path, link_rawquery, page_host,
         |  MIN(link_scheme) AS link_scheme, MIN(link_text) AS link_text,
         |  MIN(nofollow) AS nofollow, MIN(noindex) AS noindex,
         |  MIN(date_from) AS date_from, MAX(date_to) AS date_to,
         |  arg_max(ip, $lineKeySql) AS ip,
         |  arg_min(page_path, $variantKeySql) AS page_path,
         |  arg_min(page_rawquery, $variantKeySql) AS page_rawquery,
         |  arg_min(page_scheme, $variantKeySql) AS page_scheme,
         |  CAST(SUM(qty) AS BIGINT) AS qty
         |FROM links
         |GROUP BY link_domain, link_subdomain, link_path, link_rawquery, page_host""".stripMargin)
  )

  private val linkUrlExpr =
    "concat(case when link_scheme = '1' then 'http' else 'https' end, '://', " +
      "case when link_subdomain = '' then '' else concat(link_subdomain, '.') end, " +
      "link_domain, case when link_path = '' then '/' else link_path end, " +
      "case when link_rawquery = '' then '' else concat('?', link_rawquery) end)"
  private val linkUrlSql =
    "(CASE WHEN link_scheme = '1' THEN 'http' ELSE 'https' END) || '://' || " +
      "(CASE WHEN link_subdomain = '' THEN '' ELSE link_subdomain || '.' END) || " +
      "link_domain || (CASE WHEN link_path = '' THEN '/' ELSE link_path END) || " +
      "(CASE WHEN link_rawquery = '' THEN '' ELSE '?' || link_rawquery END)"
  private val pageUrlExpr =
    "concat('https://', page_host, page_path, " +
      "case when page_rawquery = '' then '' else concat('?', page_rawquery) end)"
  private val pageUrlSql =
    "'https://' || page_host || page_path || " +
      "(CASE WHEN page_rawquery = '' THEN '' ELSE '?' || page_rawquery END)"

  /** The LinkDB API query (controller.go:22-237): domain + attribute
    * filters -> duplicate merge (min/max dates, distinct IPs, Qty sum)
    * -> deterministic sort -> page 1. Filters evaluate before the
    * aggregate so they push into the scan.
    */
  val q18_linkdb_query: GraftQuery = GraftQuery(
    "q18_linkdb_query",
    (s, dir) =>
      Tables.links(s, dir)
        .filter(col("link_domain") === "d3.com" && col("nofollow") === 0 &&
          lower(col("link_text")).contains("urgent"))
        .select(expr(linkUrlExpr).as("link_url"), expr(pageUrlExpr).as("page_url"),
          col("link_text"), col("nofollow"), col("date_from"), col("date_to"),
          col("ip"), col("qty"))
        .groupBy(col("link_url"), col("page_url"), col("link_text"), col("nofollow"))
        .agg(
          min(col("date_from")).as("date_from"),
          max(col("date_to")).as("date_to"),
          // collect_set here is NATURALLY bounded: the group key pins
          // one (link_url, page_url) edge, so the set holds one crawled
          // host's serving IPs (a DNS record, not a corpus-sized list) —
          // unlike the LSH bucket sites, no BoundedCollectSet needed
          array_join(sort_array(collect_set(col("ip"))), ",").as("ips"),
          sum(col("qty")).as("qty"))
        .orderBy(col("link_url"), col("page_url"), col("link_text"), col("nofollow"))
        .limit(20),
    Some(Tables.linksCte +
      s"""SELECT link_url, page_url, link_text, nofollow,
         |  MIN(date_from) AS date_from, MAX(date_to) AS date_to,
         |  array_to_string(list_sort(list(DISTINCT ip)), ',') AS ips,
         |  CAST(SUM(qty) AS BIGINT) AS qty
         |FROM (
         |  SELECT $linkUrlSql AS link_url, $pageUrlSql AS page_url,
         |         link_text, nofollow, date_from, date_to, ip, qty
         |  FROM links
         |  WHERE link_domain = 'd3.com' AND nofollow = 0
         |    AND lower(link_text) LIKE '%urgent%') t
         |GROUP BY link_url, page_url, link_text, nofollow
         |ORDER BY link_url, page_url, link_text, nofollow
         |LIMIT 20""".stripMargin)
  )

  /** URL -> (scheme, host, path, query) decomposition (wat.go:623-678)
    * with plain regexes that stay inside WholeStageCodegen.
    */
  val q19_url_parse: GraftQuery = GraftQuery(
    "q19_url_parse",
    (s, dir) =>
      Tables.links(s, dir)
        .select(expr(linkUrlExpr).as("url"))
        .distinct()
        .select(
          col("url"),
          regexp_extract(col("url"), "^([a-z]+)://", 1).as("scheme"),
          regexp_extract(col("url"), "^[a-z]+://([^/?#]+)", 1).as("host"),
          regexp_extract(col("url"), "^[a-z]+://[^/?#]+([^?#]*)", 1).as("path"),
          regexp_extract(col("url"), "^[^#?]*[?]([^#]*)", 1).as("query")),
    Some(Tables.linksCte +
      s"""SELECT url,
         |  COALESCE(regexp_extract(url, '^([a-z]+)://', 1), '') AS scheme,
         |  COALESCE(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1), '') AS host,
         |  COALESCE(regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1), '') AS path,
         |  COALESCE(regexp_extract(url, '^[^#?]*[?]([^#]*)', 1), '') AS query
         |FROM (SELECT DISTINCT $linkUrlSql AS url FROM links) u""".stripMargin)
  )

  /** eTLD+1 / subdomain split (wat.go:660-676, genSubdomain wat.go:953-962)
    * through the FULL embedded public-suffix table (graft.functions
    * .PublicSuffixList — the Spark analogue of Go's
    * publicsuffix.EffectiveTLDPlusOne, wat.go:664). Beyond the derived
    * testdata hosts, a fixed vector of PSL-hard hosts is injected —
    * private suffixes (github.io), 2/3-label ccTLD suffixes, wildcard
    * (*.ck, *.nagoya.jp) and exception (!www.ck, !city.kawasaki.jp)
    * rules, punycode IDN — with the expected splits declared verbatim
    * in the oracle.
    */
  val q20_etld_domain: GraftQuery = GraftQuery(
    "q20_etld_domain",
    (s, dir) => {
      import s.implicits._
      import graft.functions.UrlFns
      val tricky = PslVectors.map(_._1).toDF("host")
      val hosts = Tables.links(s, dir)
        .select(expr(
          "case when link_subdomain = '' then link_domain " +
            "else concat(link_subdomain, '.', link_domain) end").as("host"))
        .union(Tables.links(s, dir).select(col("page_host").as("host")))
        .union(tricky)
        .distinct()
      hosts
        .withColumn("etld1", UrlFns.etld1(col("host")))
        .withColumn("subdomain", UrlFns.subdomainOf(col("host"), col("etld1")))
    },
    Some(Tables.linksCte +
      s"""SELECT host,
        |  CASE WHEN host LIKE '%.co.uk' THEN regexp_extract(host, '([^.]+[.]co[.]uk)$$', 1)
        |       ELSE regexp_extract(host, '([^.]+[.][^.]+)$$', 1) END AS etld1,
        |  CASE WHEN length(host) > length(CASE WHEN host LIKE '%.co.uk' THEN regexp_extract(host, '([^.]+[.]co[.]uk)$$', 1)
        |                                       ELSE regexp_extract(host, '([^.]+[.][^.]+)$$', 1) END)
        |       THEN substr(host, 1, length(host) - length(CASE WHEN host LIKE '%.co.uk' THEN regexp_extract(host, '([^.]+[.]co[.]uk)$$', 1)
        |                                                       ELSE regexp_extract(host, '([^.]+[.][^.]+)$$', 1) END) - 1)
        |       ELSE '' END AS subdomain
        |FROM (
        |  SELECT DISTINCT host FROM (
        |    SELECT CASE WHEN link_subdomain = '' THEN link_domain
        |                ELSE link_subdomain || '.' || link_domain END AS host FROM links
        |    UNION ALL
        |    SELECT page_host AS host FROM links) h) hh
        |UNION ALL
        |SELECT * FROM (VALUES
        |$pslVectorsSql) v(host, etld1, subdomain)""".stripMargin)
  )

  /** PSL-hard test vectors: (host, expected eTLD+1 or null, expected
    * subdomain). Expected values follow the published PSL algorithm
    * (publicsuffix.org/list): github.io is a PRIVATE-section suffix;
    * *.ck is a wildcard with the !www.ck exception; *.nagoya.jp /
    * !city.kawasaki.jp likewise; рф indexes under its punycode form.
    * A bare public suffix has NO registrable domain (Go returns an
    * error; the Column is NULL).
    */
  private lazy val PslVectors: Seq[(String, String, String)] = Seq(
    ("blog.user.github.io", "user.github.io", "blog"),
    ("www.site.com.pl", "site.com.pl", "www"),
    ("a.b.example.co.kr", "example.co.kr", "a.b"),
    ("foo.bar.ck", "foo.bar.ck", ""),
    ("x.www.ck", "www.ck", "x"),
    ("media.city.kawasaki.jp", "city.kawasaki.jp", "media"),
    ("sub.foo.nagoya.jp", "sub.foo.nagoya.jp", ""),
    ("example.xn--p1ai", "example.xn--p1ai", ""),
    ("github.io", null, ""))

  private def pslVectorsSql: String =
    PslVectors.map { case (h, e, sub) =>
      val eSql = if (e == null) "CAST(NULL AS VARCHAR)" else s"'$e'"
      s"  ('$h', $eSql, '$sub')"
    }.mkString(",\n")

  private val ipRegex =
    "^(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9][0-9]|[0-9])([.](25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9][0-9]|[0-9])){3}$"
  private val domainRegex =
    "^([a-z0-9]([a-z0-9-]{0,61}[a-z0-9])?[.])+[a-z]{2,}$"

  /** Host/domain quality gates (wat.go:561-620): no-dot hosts, IP hosts
    * and malformed domains are classified; invalid rows are injected
    * deterministically so every verdict class is exercised.
    */
  val q21_url_quality: GraftQuery = GraftQuery(
    "q21_url_quality",
    (s, dir) =>
      Tables.links(s, dir)
        .withColumn("test_host",
          when(col("src_key") % 17 === 0, lit("badhost"))
            .when(col("src_key") % 19 === 0, lit("192.168.1.1"))
            .when(col("src_key") % 23 === 0, lit("bad..host!.com"))
            .otherwise(col("page_host")))
        .withColumn("verdict",
          when(!col("test_host").contains("."), lit("no_dot"))
            .when(col("test_host").rlike(ipRegex), lit("ip_host"))
            .when(!lower(col("test_host")).rlike(domainRegex), lit("bad_domain"))
            .otherwise(lit("ok")))
        .groupBy(col("verdict"))
        .agg(count(lit(1)).as("n"), countDistinct(col("test_host")).as("n_hosts")),
    Some(Tables.linksCte +
      s"""SELECT verdict, COUNT(*) AS n, COUNT(DISTINCT test_host) AS n_hosts
         |FROM (
         |  SELECT test_host,
         |    CASE WHEN NOT contains(test_host, '.') THEN 'no_dot'
         |         WHEN regexp_matches(test_host, '$ipRegex') THEN 'ip_host'
         |         WHEN NOT regexp_matches(lower(test_host), '$domainRegex') THEN 'bad_domain'
         |         ELSE 'ok' END AS verdict
         |  FROM (
         |    SELECT CASE WHEN src_key % 17 = 0 THEN 'badhost'
         |                WHEN src_key % 19 = 0 THEN '192.168.1.1'
         |                WHEN src_key % 23 = 0 THEN 'bad..host!.com'
         |                ELSE page_host END AS test_host
         |    FROM links) t) v
         |GROUP BY verdict""".stripMargin)
  )

  /** Ignore-list semantics (config.go, wat.go:698-733): domain blocklist
    * as a broadcast anti-join, TLD suffix filter, file-extension filter.
    */
  val q22_ignore_lists: GraftQuery = GraftQuery(
    "q22_ignore_lists",
    (s, dir) => {
      import s.implicits._
      val ignore = Seq("d3.com", "d5.com", "d7.co.uk").toDF("ignored_domain")
      Tables.links(s, dir)
        .withColumn("eff_path",
          when(col("src_key") % 6 === 0, concat(col("link_path"), lit(".jpg")))
            .otherwise(col("link_path")))
        .join(broadcast(ignore), col("link_domain") === col("ignored_domain"), "left_anti")
        .filter(!col("link_domain").endsWith(".cn"))
        .filter(!col("eff_path").endsWith(".jpg") && !col("eff_path").endsWith(".png"))
        .groupBy(col("link_domain"))
        .agg(count(lit(1)).as("n_links"))
    },
    Some(Tables.linksCte +
      """SELECT link_domain, COUNT(*) AS n_links
        |FROM (SELECT link_domain,
        |        CASE WHEN src_key % 6 = 0 THEN link_path || '.jpg' ELSE link_path END AS eff_path
        |      FROM links) t
        |WHERE link_domain NOT IN ('d3.com', 'd5.com', 'd7.co.uk')
        |  AND NOT link_domain LIKE '%.cn'
        |  AND NOT eff_path LIKE '%.jpg' AND NOT eff_path LIKE '%.png'
        |GROUP BY link_domain""".stripMargin)
  )

  /** Per-page link tallies (wat.go:480-559 internal/external counters). */
  val q23_page_stats: GraftQuery = GraftQuery(
    "q23_page_stats",
    (s, dir) =>
      Tables.links(s, dir)
        .groupBy(col("page_host"))
        .agg(
          count(lit(1)).as("n_links"),
          countDistinct(col("link_domain")).as("n_domains"),
          sum(col("nofollow")).cast("bigint").as("n_nofollow"),
          min(col("date_from")).as("first_seen"),
          max(col("date_to")).as("last_seen")),
    Some(Tables.linksCte +
      """SELECT page_host, COUNT(*) AS n_links,
        |  COUNT(DISTINCT link_domain) AS n_domains,
        |  CAST(SUM(nofollow) AS BIGINT) AS n_nofollow,
        |  MIN(date_from) AS first_seen, MAX(date_to) AS last_seen
        |FROM links GROUP BY page_host""".stripMargin)
  )

  /** Per-domain anchor-text profile — the summary card every backlink
    * tool shows for a domain: how many distinct anchors point at it,
    * the dominant anchor, total links, and the nofollow share. Two
    * stacked map-side-combined aggregates (per (domain, anchor), then
    * per domain); the dominant anchor is a `max_by` over a (count,
    * text) struct so ties break deterministically on both engines.
    */
  val q54_anchor_profile: GraftQuery = GraftQuery(
    "q54_anchor_profile",
    (s, dir) =>
      Tables.links(s, dir)
        .groupBy(col("link_domain"), col("link_text"))
        .agg(count(lit(1)).as("cnt"), sum(col("nofollow")).as("nf"))
        .groupBy(col("link_domain"))
        .agg(
          count(lit(1)).cast("bigint").as("n_anchors"),
          expr("max_by(link_text, struct(cnt, link_text))").as("top_anchor"),
          sum(col("cnt")).cast("bigint").as("n_links"),
          (sum(col("nf")).cast("double") / sum(col("cnt")).cast("double"))
            .as("nofollow_share")),
    Some(Tables.linksCte +
      """, per AS (
        |  SELECT link_domain, link_text, COUNT(*) AS cnt, SUM(nofollow) AS nf
        |  FROM links GROUP BY link_domain, link_text
        |), ranked AS (
        |  SELECT link_domain, link_text,
        |    ROW_NUMBER() OVER (PARTITION BY link_domain
        |                       ORDER BY cnt DESC, link_text DESC) AS rk
        |  FROM per
        |)
        |SELECT p.link_domain,
        |  CAST(COUNT(*) AS BIGINT) AS n_anchors,
        |  MIN(r.link_text) AS top_anchor,
        |  CAST(SUM(p.cnt) AS BIGINT) AS n_links,
        |  CAST(SUM(p.nf) AS DOUBLE) / CAST(SUM(p.cnt) AS DOUBLE) AS nofollow_share
        |FROM per p
        |JOIN ranked r ON p.link_domain = r.link_domain AND r.rk = 1
        |GROUP BY p.link_domain""".stripMargin)
  )

  /** URL canonicalization dedup — the crawl-side twin of q24's content
    * dedup: the same resource reached via case-different hosts,
    * trailing slashes, and tracking parameters (`utm_*`, `fbclid`,
    * `gclid`) must count as ONE url before any per-url statistic means
    * anything. Canonical form: lowercase host, trailing slash stripped,
    * tracking params dropped, surviving params sorted. The fixture
    * plants all three variant kinds on every 7th link (the
    * docsWithNearDups pattern: plant the phenomenon, then detect it);
    * the oracle re-plants and re-canonicalizes in SQL.
    *
    * Scale shape: canonicalization is row-local; the only shuffle is
    * the final groupBy(canonical_url). The filter/sort lambdas run
    * interpreted, but over PARAMS PER URL (≤ a handful) — not corpus
    * text — so they stay off the critical path; at 100 TB this is one
    * map + one hash aggregate.
    */
  val q56_url_canonical: GraftQuery = GraftQuery(
    "q56_url_canonical",
    (s, dir) => {
      val base = Tables.links(s, dir).select(
        when(col("link_scheme") === "2", lit("https")).otherwise(lit("http")).as("scheme"),
        concat(
          when(col("link_subdomain") === "", lit(""))
            .otherwise(concat(col("link_subdomain"), lit("."))),
          col("link_domain")).as("host"),
        col("link_path").as("path"),
        col("link_rawquery").as("q"),
        col("qty"), col("src_key"))
      val variants = base.filter(col("src_key") % 7 === 0).select(
        col("scheme"),
        upper(col("host")).as("host"),
        concat(col("path"), lit("/")).as("path"),
        when(col("q") === "", lit("utm_source=feed&utm_campaign=x"))
          .otherwise(concat(col("q"), lit("&utm_source=feed&utm_campaign=x"))).as("q"),
        col("qty"), col("src_key"))
      base.unionByName(variants)
        .withColumn("cq", expr(
          "array_join(array_sort(filter(split(q, '&'), p -> NOT (" +
            "startswith(p, 'utm_') OR startswith(p, 'fbclid=') OR startswith(p, 'gclid=')))), '&')"))
        // rtrim('/') ≡ regexp_replace('/+$', '') and is a codegen'd
        // byte scan instead of a regex engine pass per URL
        .withColumn("canonical_url", concat(
          col("scheme"), lit("://"), lower(col("host")),
          rtrim(col("path"), "/"),
          when(col("cq") === "", lit("")).otherwise(concat(lit("?"), col("cq")))))
        .groupBy(col("canonical_url"))
        .agg(
          count(lit(1)).cast("bigint").as("n_variants"),
          sum(col("qty")).cast("bigint").as("qty_sum"))
    },
    Some(Tables.linksCte +
      """, base AS (
        |  SELECT CASE WHEN link_scheme = '2' THEN 'https' ELSE 'http' END AS scheme,
        |    (CASE WHEN link_subdomain = '' THEN '' ELSE link_subdomain || '.' END)
        |      || link_domain AS host,
        |    link_path AS path, link_rawquery AS q, qty, src_key
        |  FROM links
        |), withvar AS (
        |  SELECT scheme, host, path, q, qty FROM base
        |  UNION ALL
        |  SELECT scheme, upper(host), path || '/',
        |    CASE WHEN q = '' THEN 'utm_source=feed&utm_campaign=x'
        |         ELSE q || '&utm_source=feed&utm_campaign=x' END, qty
        |  FROM base WHERE src_key % 7 = 0
        |), canon AS (
        |  SELECT scheme || '://' || lower(host)
        |    || regexp_replace(path, '/+$', '')
        |    || (CASE WHEN cq = '' THEN '' ELSE '?' || cq END) AS canonical_url, qty
        |  FROM (
        |    SELECT scheme, host, path, qty,
        |      -- COALESCE: DuckDB's array_to_string([]) is NULL, not ''
        |      COALESCE(array_to_string(list_sort(list_filter(string_split(q, '&'),
        |        p -> NOT (starts_with(p, 'utm_') OR starts_with(p, 'fbclid=')
        |                  OR starts_with(p, 'gclid=')))), '&'), '') AS cq
        |    FROM withvar) t
        |)
        |SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS n_variants,
        |  CAST(SUM(qty) AS BIGINT) AS qty_sum
        |FROM canon GROUP BY canonical_url""".stripMargin)
  )

  /** Domain co-citation — the backlink-analytics question the
    * reference's data model exists to answer at graph level: which
    * domain PAIRS are repeatedly linked from the same pages (co-cited
    * domains are topically related — the classic SEO/IR signal).
    * Bucket = page, members = its distinct outgoing domains, pairs
    * counted across pages.
    *
    * Deliberately written in the PLAIN user spelling —
    * `collect_set + filter(size ≤ cap)` — because the library's own
    * [[graft.plans.RewriteCappedCollectToBounded]] optimizer rule
    * (live in every GraftConf session) rewrites it to the bounded
    * aggregate: this query is the driver-gated proof that a user gets
    * the hot-bucket memory guard without writing it. A hub page
    * linking to 10⁵ domains would otherwise build the array before
    * the cap ran; with the rule its key tombstones during
    * aggregation. The oracle models the cap (BETWEEN 2 AND 64); the
    * fixture's ≤ 22 distinct domains per page never reach it.
    */
  val q68_cocitation: GraftQuery = GraftQuery(
    "q68_cocitation",
    (s, dir) =>
      Tables.links(s, dir)
        .select(concat(col("page_host"), col("page_path")).as("page"),
          col("link_domain"))
        .groupBy(col("page"))
        .agg(sort_array(collect_set(col("link_domain"))).as("ds"))
        .filter(size(col("ds")).between(2, graft.operators.SimilarityOps.MaxBucket))
        .select(explode(expr(
          "flatten(transform(ds, (a, i) -> " +
            "transform(slice(ds, i + 2, size(ds)), " +
            "b -> named_struct('a_domain', a, 'b_domain', b))))")).as("p"))
        .select(col("p.a_domain"), col("p.b_domain"))
        .groupBy(col("a_domain"), col("b_domain"))
        .agg(count(lit(1)).cast("bigint").as("n_pages")),
    Some(Tables.linksCte +
      """, pd AS (
        |  SELECT DISTINCT page_host || page_path AS page, link_domain FROM links
        |), caps AS (
        |  SELECT page FROM pd GROUP BY page HAVING COUNT(*) BETWEEN 2 AND 64
        |)
        |SELECT a.link_domain AS a_domain, b.link_domain AS b_domain,
        |       CAST(COUNT(*) AS BIGINT) AS n_pages
        |FROM pd a
        |JOIN pd b ON a.page = b.page AND a.link_domain < b.link_domain
        |JOIN caps c ON a.page = c.page
        |GROUP BY 1, 2""".stripMargin)
  )

  val all: Seq[GraftQuery] = Seq(
    q15_json_extract, q16_sessionize, q17_compact_links, q18_linkdb_query,
    q19_url_parse, q20_etld_domain, q21_url_quality, q22_ignore_lists,
    q23_page_stats, q54_anchor_profile, q56_url_canonical, q68_cocitation)
}
