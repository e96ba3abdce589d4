package graft.sources

import graft.functions.UrlFns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Common Crawl WAT ingestion, Spark-first.
  *
  * The reference streams gzipped WAT files line-by-line in Go
  * (pkg/commoncrawl/wat.go): detects JSON metadata lines, gjson-reads
  * the envelope fields, then imperatively filters/derives link rows.
  * Here the same extraction is ONE declarative plan: `spark.read.text`
  * (gzip is transparent, and on a cluster each WAT file is a split) →
  * `from_json` with an explicit schema of exactly the fields used →
  * `explode(links)` → vectorized filter/derive columns. Catalyst prunes
  * the JSON parse to the schema subset; every record-level rule from
  * wat.go:480-559 (A@/href only, http(s)/protocol-relative only,
  * rel=nofollow, same-host/same-domain skip, quality + ignore lists)
  * is a Column predicate.
  */
object WatSource {

  private val metasType = ArrayType(StructType(Seq(
    StructField("name", StringType),
    StructField("content", StringType),
    StructField("property", StringType))))

  private val linksType = ArrayType(StructType(Seq(
    StructField("path", StringType),
    StructField("url", StringType),
    StructField("text", StringType),
    StructField("rel", StringType))))

  private val headLinksType = ArrayType(StructType(Seq(
    StructField("path", StringType),
    StructField("url", StringType),
    StructField("rel", StringType))))

  private val headType = StructType(Seq(
    StructField("Title", StringType),
    StructField("Metas", metasType),
    StructField("Link", headLinksType)))
  private val htmlMetaType = StructType(Seq(
    StructField("Head", headType),
    StructField("Links", linksType)))
  private val payloadMetaType = StructType(Seq(
    StructField("HTTP-Response-Metadata", StructType(Seq(
      StructField("HTML-Metadata", htmlMetaType))))))
  private val warcHeaderType = StructType(Seq(
    StructField("WARC-Target-URI", StringType),
    StructField("WARC-IP-Address", StringType),
    StructField("WARC-Date", StringType)))

  /** Only the envelope fields wat.go reads (wat.go:404-431). */
  val watSchema: StructType = StructType(Seq(
    StructField("Envelope", StructType(Seq(
      StructField("WARC-Header-Metadata", warcHeaderType),
      StructField("Payload-Metadata", payloadMetaType))))))

  /** Segment file number from a WAT filename (wat.go
    * ExtractWatFileNumber): `example-123.warc.wat.gz` → "123"; no
    * match → "" (the Go version errors; a Column has no error channel).
    */
  def watFileNumber(filename: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract(filename, "-([0-9]+)\\.warc\\.wat\\.gz$", 1)

  /** One row per crawled page: URI/IP/date/title, robots flags, links. */
  def pages(spark: SparkSession, path: String): DataFrame =
    pages(spark, Seq(path))

  /** Multi-segment variant: `textFile` treats a comma-joined string as
    * ONE path (it does not split), so multiple segments must go through
    * the varargs overload.
    */
  def pages(spark: SparkSession, paths: Seq[String]): DataFrame =
    pagesFromLines(spark.read.textFile(paths: _*).toDF("line"))

  /** Core extraction over a `line` column — input-agnostic, so the SAME
    * plan serves batch reads and `readStream.text` (Pipeline
    * .streamImport).
    */
  def pagesFromLines(lines: DataFrame): DataFrame =
    refinePages(lines
      .filter(col("line").startsWith("{"))
      .select(from_json(col("line"), watSchema).as("w"))
      .select(
        col("w.Envelope.`WARC-Header-Metadata`.`WARC-Target-URI`").as("page_url"),
        col("w.Envelope.`WARC-Header-Metadata`.`WARC-IP-Address`").as("ip"),
        substring(col("w.Envelope.`WARC-Header-Metadata`.`WARC-Date`"), 1, 10).as("crawl_date"),
        col("w.Envelope.`Payload-Metadata`.`HTTP-Response-Metadata`.`HTML-Metadata`.Head.Title").as("title"),
        col("w.Envelope.`Payload-Metadata`.`HTTP-Response-Metadata`.`HTML-Metadata`.Head.Metas").as("metas"),
        col("w.Envelope.`Payload-Metadata`.`HTTP-Response-Metadata`.`HTML-Metadata`.Head.Link").as("head_links"),
        col("w.Envelope.`Payload-Metadata`.`HTTP-Response-Metadata`.`HTML-Metadata`.Links").as("links")))

  /** The record-level page gates shared by every ingestion format: WAT
    * metadata (above) and raw-WARC HTML reconstruction
    * ([[WarcSource.pages]]) both produce the raw contract
    * `(page_url, ip, crawl_date, title, metas, head_links, links)` and
    * flow through THIS one chain, so format parity is structural, not
    * duplicated logic.
    */
  private[sources] def refinePages(raw: DataFrame): DataFrame =
    raw
      .filter(col("page_url").isNotNull && col("page_url").startsWith("http"))
      // robots meta flags (wat.go getNoFollowNoIndex)
      .withColumn("noindex",
        when(exists(col("metas"), m =>
          m.getField("name") === "robots" && m.getField("content").contains("noindex")), 1)
          .otherwise(0))
      .withColumn("page_nofollow",
        when(exists(col("metas"), m =>
          m.getField("name") === "robots" && m.getField("content").contains("nofollow")), 1)
          .otherwise(0))
      // noindex pages are dropped ENTIRELY before link extraction
      // (verifyContentQuality, wat.go:746-749) — the flag column stays
      // for schema compat but is always 0 on surviving rows
      .filter(col("noindex") === 0)
      .withColumn("page_host", urlHost(col("page_url")))
      .withColumn("page_domain", etld1(col("page_host")))
      .withColumn("page_path", normalizePath(urlPath(col("page_url"))))
      .withColumn("page_rawquery", cleanQuery(urlRawQuery(col("page_url"))))
      .withColumn("page_scheme", schemeCode(urlScheme(col("page_url"))))
      .filter(isParseableUrl(col("page_url")))
      .filter(isValidHost(col("page_host")))
      // page-side verifyRecordQuality (wat.go:311 applies it to the
      // SOURCE page record too): blocked TLD, garbage query, pipe chars
      .filter(!hasIgnoredTld(col("page_domain")) && col("page_domain") =!= "")
      .filter(isQualityQuery(col("page_rawquery")))
      .filter(!col("page_path").contains("|"))
      // canonical-link gate (wat.go:758-815): a page whose
      // rel=canonical points at another host or path — or that carries
      // a query while declaring a canonical — is a duplicate-content
      // page and is dropped
      .withColumn("canon", try_element_at( // ANSI-safe on empty arrays
        filter(coalesce(col("head_links"), array()), l =>
          l.getField("rel") === "canonical" &&
            l.getField("url").isNotNull && l.getField("url") =!= ""), lit(1)))
      .withColumn("canon_url", normalizeUrl(col("canon.url")))
      .withColumn("canon_abs", col("canon_url").startsWith("http"))
      .withColumn("canon_path",
        when(col("canon_abs"), urlPath(col("canon_url"))).otherwise(col("canon_url")))
      .filter(col("canon").isNull || (
        (!col("canon_abs") || urlHost(col("canon_url")) === col("page_host")) &&
          (when(col("canon_path") === "", "/").otherwise(col("canon_path")) ===
            col("page_path")) && // page_path already "/"-normalized
          col("page_rawquery") === ""))
      .drop("canon", "canon_url", "canon_abs", "canon_path")

  /** One row per kept outbound link, in the compacted-link input schema
    * (ready for LinkCompaction). `ignoreDomains` mirrors the
    * config.go blocklist; it arrives as a broadcastable local Seq.
    */
  def links(spark: SparkSession, path: String,
      ignoreDomains: Seq[String]): DataFrame =
    links(spark, Seq(path), ignoreDomains)

  def links(spark: SparkSession, path: String): DataFrame =
    links(spark, Seq(path), Nil)

  def links(spark: SparkSession, paths: Seq[String],
      ignoreDomains: Seq[String] = Nil): DataFrame =
    linksFromPages(pages(spark, paths), ignoreDomains)

  /** Streaming-compatible link extraction from raw WAT lines. */
  def linksFromLines(lines: DataFrame, ignoreDomains: Seq[String] = Nil): DataFrame =
    linksFromPages(pagesFromLines(lines), ignoreDomains)

  private[sources] def linksFromPages(p: DataFrame, ignoreDomains: Seq[String]): DataFrame = {
    val exploded = p.select(
      col("page_host"), col("page_domain"), col("page_path"),
      col("page_rawquery"), col("page_scheme"), col("ip"),
      col("crawl_date"), col("noindex"), col("page_nofollow"),
      explode(col("links")).as("l"))
    val withUrl = exploded
      .filter(col("l.path") === "A@/href") // anchors only (wat.go:505)
      .filter(col("l.url").startsWith("http") || col("l.url").startsWith("//"))
      .withColumn("u", normalizeUrl(col("l.url")))
      .withColumn("link_host", urlHost(col("u")))
      .withColumn("link_domain", etld1(col("link_host")))
    val ignored =
      if (ignoreDomains.isEmpty) lit(false)
      else col("link_domain").isInCollection(ignoreDomains)
    withUrl
      .filter(isParseableUrl(col("u"))) // control chars = unparseable
      .filter(col("link_host") =!= col("page_host")) // internal link
      .filter(col("link_domain") =!= col("page_domain")) // same site
      .filter(isValidHost(col("link_host")))
      .filter(col("link_domain") =!= "" && !hasIgnoredTld(col("link_domain")))
      .withColumn("link_path", normalizePath(urlPath(col("u"))))
      .filter(!hasIgnoredExtension(col("link_path")))
      .filter(!col("link_path").contains("|")) // pipe in path (wat.go:634)
      .filter(!ignored)
      // tracking-prefixed queries clear to ""; garbage queries (>200
      // bytes or pipe chars) drop the record (verifyRecordQuality)
      .withColumn("link_rawquery", cleanQuery(urlRawQuery(col("u"))))
      .filter(isQualityQuery(col("link_rawquery")))
      .select(
        col("link_domain"),
        subdomainOf(col("link_host"), col("link_domain")).as("link_subdomain"),
        col("link_path"),
        col("link_rawquery"),
        schemeCode(urlScheme(col("u"))).as("link_scheme"),
        col("page_host"), col("page_path"), col("page_rawquery"), col("page_scheme"),
        coalesce(col("l.text"), lit("")).as("link_text"),
        when(col("page_nofollow") === 1 || col("l.rel").startsWith("nofollow"), 1)
          .otherwise(0).as("nofollow"),
        col("noindex"),
        col("crawl_date").as("date_from"),
        col("crawl_date").as("date_to"),
        coalesce(col("ip"), lit("")).as("ip"),
        lit(1L).as("qty"))
  }
}
