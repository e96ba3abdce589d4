package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One parsed WARC record. Top-level (not nested in the object):
  * Janino's generated encoder code cannot reach private/nested case
  * classes.
  *
  * `body` is the payload AFTER any HTTP headers (for `response`
  * records) decoded as lossy UTF-8 and truncated at the reader's
  * `maxBodyBytes`; `truncated` records that the cap fired (the full
  * payload was still consumed from the stream, so framing survives).
  */
final case class WarcRecord(
    warc_file: String,
    warc_type: String,
    target_uri: String,
    warc_date: String,
    ip: String,
    http_status: Int,
    http_content_type: String,
    body: String,
    truncated: Boolean)

/** Raw WARC ingestion — a capability the reference does NOT have (it
  * only reads the WAT metadata sidecars, pkg/commoncrawl/wat.go): when
  * a crawl ships WARC-only, the same pipeline must run from the raw
  * records. Shape:
  *
  *   - **Framing is per-file imperative** (`binaryFiles` +
  *     [[parseWarc]]): WARC's gzip is multi-member (one member per
  *     record) and therefore NOT block-splittable, so the unit of
  *     parallelism is the FILE — exactly how a 100k-file crawl
  *     distributes across a cluster (one task per WARC, streaming
  *     decode, memory bounded by one record body). This is the one
  *     place `mapPartitions`-style code is genuinely required.
  *   - **Everything after framing is declarative**: title/meta/anchor
  *     reconstruction from raw HTML is `regexp_extract_all` +
  *     `transform` into the SAME raw-pages contract WAT parsing
  *     produces, and then the SAME `WatSource.refinePages` +
  *     `linksFromPages` chain runs — format parity with the WAT path
  *     is structural (one shared rule chain), and every per-row
  *     operation stays inside whole-stage codegen.
  */
object WarcSource {

  /** Parse WARC files (gzipped or plain) into one row per record.
    * `paths` may list files or directories; parallelism is per file.
    */
  def records(spark: SparkSession, paths: Seq[String],
      maxBodyBytes: Int = 2 * 1024 * 1024): DataFrame = {
    import spark.implicits._
    require(paths.nonEmpty, "WarcSource.records: no input paths")
    spark.sparkContext
      // binaryFiles goes through FileInputFormat.setInputPaths, which
      // DOES split a comma-joined string (unlike DataFrameReader.text —
      // see WatSource.pages); WarcSourceSpec pins this with two files
      .binaryFiles(paths.mkString(","), minPartitions = paths.size)
      .flatMap { case (file, pds) =>
        val raw = new java.io.BufferedInputStream(pds.open(), 1 << 16)
        val in =
          // java.util.zip.GZIPInputStream reads CONCATENATED members
          // transparently — exactly WARC's member-per-record layout
          if (file.endsWith(".gz")) new java.util.zip.GZIPInputStream(raw, 1 << 16)
          else raw
        // parseWarc closes on exhaustion; a PARTIALLY consumed iterator
        // (a limit/take over records) would otherwise hold the file
        // handle for the task's lifetime — close on task completion too
        // (InputStream.close is idempotent, double-close is safe)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
        parseWarc(file, in, maxBodyBytes)
      }
      .toDF()
  }

  /** Streaming WARC record iterator: `WARC/1.x` version line, headers
    * to the blank line, `Content-Length` payload bytes, inter-record
    * blank lines. For `response` records the payload's own HTTP status
    * line + headers are split off into `http_status` /
    * `http_content_type`. Closes `in` on exhaustion. Tolerates both
    * CRLF (the spec) and bare LF (hand-built fixtures).
    */
  private[sources] def parseWarc(file: String, in: java.io.InputStream,
      maxBodyBytes: Int): Iterator[WarcRecord] = new Iterator[WarcRecord] {
    private var nextRec: WarcRecord = null
    private var done = false

    private def readLine(): String = {
      // WARC headers are ASCII; byte-wise readLine avoids decoding the
      // (possibly binary) payload that follows
      val sb = new java.lang.StringBuilder(80)
      var b = in.read()
      if (b < 0) return null
      while (b >= 0 && b != '\n') { if (b != '\r') sb.append(b.toChar); b = in.read() }
      sb.toString
    }

    private def advance(): Unit = {
      nextRec = null
      var version = readLine()
      while (version != null && !version.startsWith("WARC/")) version = readLine()
      if (version == null) { done = true; in.close(); return }
      val headers = scala.collection.mutable.Map.empty[String, String]
      var line = readLine()
      while (line != null && line.nonEmpty) {
        val i = line.indexOf(':')
        if (i > 0) headers(line.substring(0, i).trim.toLowerCase) =
          line.substring(i + 1).trim
        line = readLine()
      }
      val len = headers.get("content-length").flatMap(l =>
        scala.util.Try(l.toLong).toOption).getOrElse(0L)
      // read exactly len payload bytes, keeping at most maxBodyBytes:
      // framing must survive a record far larger than the cap
      val keep = math.min(len, maxBodyBytes.toLong).toInt
      val buf = new Array[Byte](keep)
      var off = 0
      while (off < keep) {
        val n = in.read(buf, off, keep - off)
        if (n < 0) { done = true; in.close(); return } // truncated file: drop partial record
        off += n
      }
      var toSkip = len - keep
      while (toSkip > 0) {
        val n = in.skip(toSkip)
        if (n <= 0) { if (in.read() < 0) { done = true; in.close(); return }; toSkip -= 1 }
        else toSkip -= n
      }
      val warcType = headers.getOrElse("warc-type", "")
      val payload = new String(buf, java.nio.charset.StandardCharsets.UTF_8)
      // response payloads are an HTTP message: split status/headers off
      val (status, cType, body) =
        if (warcType == "response" && payload.startsWith("HTTP/")) {
          val headerEnd = {
            val a = payload.indexOf("\r\n\r\n")
            val b = payload.indexOf("\n\n")
            if (a < 0) b else if (b < 0) a else math.min(a, b)
          }
          val (head, rest) =
            if (headerEnd < 0) (payload, "")
            else (payload.substring(0, headerEnd),
              payload.substring(headerEnd).dropWhile(c => c == '\r' || c == '\n'))
          val st = "HTTP/\\S+\\s+(\\d{3})".r.findFirstMatchIn(head)
            .map(_.group(1).toInt).getOrElse(0)
          val ct = "(?im)^content-type:\\s*([^;\\r\\n]+)".r.findFirstMatchIn(head)
            .map(_.group(1).trim).getOrElse("")
          (st, ct, rest)
        } else (0, headers.getOrElse("content-type", ""), payload)
      nextRec = WarcRecord(
        warc_file = file,
        warc_type = warcType,
        target_uri = headers.getOrElse("warc-target-uri", ""),
        warc_date = headers.getOrElse("warc-date", ""),
        ip = headers.getOrElse("warc-ip-address", ""),
        http_status = status,
        http_content_type = cType,
        body = body,
        truncated = len > keep)
    }

    override def hasNext: Boolean = {
      if (nextRec == null && !done) advance()
      nextRec != null
    }
    override def next(): WarcRecord = {
      if (!hasNext) throw new NoSuchElementException("end of WARC stream")
      val r = nextRec; nextRec = null; r
    }
  }

  /** Successful HTML response records — the page universe. */
  def htmlPages(records: DataFrame): DataFrame =
    records
      .filter(col("warc_type") === "response" && col("http_status") === 200)
      .filter(lower(col("http_content_type")).startsWith("text/html"))
      .select(
        col("target_uri").as("page_url"),
        col("ip"),
        substring(col("warc_date"), 1, 10).as("crawl_date"),
        col("body").as("html"))

  // HTML fragment patterns. Reconstruction from raw markup is
  // necessarily best-effort (real HTML is not regular) — the goal is
  // parity with what the WAT generator extracts for well-formed pages,
  // and every step is a codegen'd builtin, no UDFs.
  private val AnchorRe = "(?is)<a\\b[^>]*>.*?</a>"
  private val MetaRe = "(?is)<meta\\b[^>]*>"
  private val HeadLinkRe = "(?is)<link\\b[^>]*>"

  private def attr(frag: org.apache.spark.sql.Column, name: String) = {
    // (?<![\w-]) not \b: '-' is a word BOUNDARY, so \b would let a
    // hyphenated attribute match its suffix (<meta data-name="x">
    // extracted as name="x", misattributing robots metas / rel gates)
    val dquoted = "(?is)(?<![\\w-])" + name + "\\s*=\\s*\"([^\"]*)\""
    val squoted = "(?is)(?<![\\w-])" + name + "\\s*=\\s*'([^']*)'"
    val bare = "(?is)(?<![\\w-])" + name + "\\s*=\\s*([^\\s>\"']+)"
    coalesce(
      nullifEmpty(regexp_extract(frag, dquoted, 1)),
      nullifEmpty(regexp_extract(frag, squoted, 1)),
      nullifEmpty(regexp_extract(frag, bare, 1)),
      lit(""))
  }

  private def nullifEmpty(c: org.apache.spark.sql.Column) = nullif(c, lit(""))

  /** Raw-pages contract from HTML (same columns WAT parsing emits),
    * feeding [[WatSource.refinePages]] — titles, robots metas,
    * rel=canonical head links and anchors all reconstructed with
    * codegen'd regexp/transform columns.
    */
  private[sources] def rawPages(html: DataFrame): DataFrame =
    html.select(
      col("page_url"),
      col("ip"),
      col("crawl_date"),
      nullifEmpty(trim(regexp_extract(col("html"),
        "(?is)<title[^>]*>(.*?)</title>", 1))).as("title"),
      transform(regexp_extract_all(col("html"), lit(MetaRe), lit(0)), m =>
        struct(
          attr(m, "name").as("name"),
          attr(m, "content").as("content"),
          attr(m, "property").as("property"))).as("metas"),
      transform(regexp_extract_all(col("html"), lit(HeadLinkRe), lit(0)), l =>
        struct(
          lit("LINK@/href").as("path"),
          attr(l, "href").as("url"),
          attr(l, "rel").as("rel"))).as("head_links"),
      transform(regexp_extract_all(col("html"), lit(AnchorRe), lit(0)), a =>
        struct(
          lit("A@/href").as("path"),
          attr(a, "href").as("url"),
          // anchor text: inner markup stripped, whitespace collapsed —
          // the WAT generator's text field for nested anchors
          trim(regexp_replace(regexp_replace(
            regexp_extract(a, "(?is)>(.*)</a>$", 1),
            "<[^>]*>", " "), "\\s+", " ")).as("text"),
          attr(a, "rel").as("rel"))).as("links"))

  /** Quality-gated pages from raw WARC — same output schema and same
    * record-level rules as [[WatSource.pages]].
    */
  def pages(spark: SparkSession, paths: Seq[String]): DataFrame =
    WatSource.refinePages(rawPages(htmlPages(records(spark, paths))))

  /** Outbound links in the compacted-link input schema, ready for
    * [[graft.operators.LinkCompaction]] — raw WARC in, the pipeline's
    * standard link rows out.
    */
  def links(spark: SparkSession, paths: Seq[String],
      ignoreDomains: Seq[String] = Nil): DataFrame =
    WatSource.linksFromPages(pages(spark, paths), ignoreDomains)

  /** Tag-stripped page text for the documents pipeline (dedup, quality
    * scoring, langid …): script/style subtrees dropped, tags → spaces,
    * the common entities decoded, whitespace collapsed.
    */
  def text(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val noMarkup = regexp_replace(regexp_replace(
      col("html"),
      "(?is)<(script|style)\\b[^>]*>.*?</\\1>", " "),
      "(?s)<[^>]*>", " ")
    // decode the common entities; &amp; LAST so "&amp;lt;" can't
    // double-decode into a phantom tag character
    val decoded = Seq("nbsp" -> " ", "lt" -> "<", "gt" -> ">",
      "quot" -> "\"", "#39" -> "'", "amp" -> "&")
      .foldLeft(noMarkup) { case (c, (ent, ch)) =>
        regexp_replace(c, s"&$ent;", java.util.regex.Matcher.quoteReplacement(ch))
      }
    htmlPages(records(spark, paths)).select(
      col("page_url"),
      col("crawl_date"),
      trim(regexp_replace(decoded, "\\s+", " ")).as("text"))
  }
}
