package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.{GraftColumnBridge => CB}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The full Mozilla Public Suffix List, embedded in the jar, with the
  * standard longest-match algorithm (https://publicsuffix.org/list/) —
  * the complete replacement for the reference's
  * `publicsuffix.EffectiveTLDPlusOne` (kris-dev-hub/globallinks
  * pkg/commoncrawl/wat.go:664, pkg/linkdb/controller.go:39).
  *
  * Scale posture: the table (~10k rules) ships INSIDE the application
  * jar, so every executor loads it once per JVM from its own classpath —
  * no broadcast variable, no join, no shuffle. Lookup is a per-row
  * HashMap probe per candidate suffix (hosts average < 5 labels), done
  * inside WholeStageCodegen via the [[Etld1]] expression below.
  *
  * Both ICANN and PRIVATE sections are loaded (private suffixes like
  * `github.io` split exactly as Go's publicsuffix does). Unicode rules
  * are also indexed under their punycode (`xn--`) form, since crawl
  * hosts arrive IDNA-encoded.
  */
object PublicSuffixList {

  private final val Normal = 1
  private final val WildcardParent = 2 // rule was "*.<key>"
  private final val Exception = 4 // rule was "!<key>"

  /** rule string → bitmask of rule kinds (a name can carry several,
    * e.g. `kawasaki.jp` is both a wildcard parent and part of an
    * exception chain).
    */
  private val rules: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](16384)
    def add(key: String, kind: Int): Unit = {
      val prev = m.get(key)
      m.put(key, if (prev == null) kind else prev | kind)
      // index unicode rules under their IDNA form too
      if (key.exists(_ >= 0x80)) {
        val ascii =
          try java.net.IDN.toASCII(key)
          catch { case _: IllegalArgumentException => key }
        if (ascii != key) {
          val prevA = m.get(ascii)
          m.put(ascii, if (prevA == null) kind else prevA | kind)
        }
      }
    }
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "graft/public_suffix_list.dat missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().foreach { raw =>
      // spec: a rule is everything up to the first whitespace; comment
      // lines start with "//"
      val line = raw.trim.takeWhile(!_.isWhitespace)
      if (line.nonEmpty && !line.startsWith("//")) {
        if (line.startsWith("!")) add(line.substring(1), Exception)
        else if (line.startsWith("*.")) add(line.substring(2), WildcardParent)
        else add(line, Normal)
      }
    } finally src.close()
    m
  }

  /** Deepest rule key in the table (labels). Probing never needs to
    * consider a candidate suffix with more labels than this — without
    * the bound, a junk 50-label crawl host would pay 50 full-string
    * hash probes per row.
    */
  private val maxKeyLabels: Int = {
    var max = 1
    val it = rules.keySet().iterator()
    while (it.hasNext) {
      val k = it.next()
      var n = 1
      var i = 0
      while (i < k.length) { if (k.charAt(i) == '.') n += 1; i += 1 }
      if (n > max) max = n
    }
    max
  }

  /** Number of labels in the public suffix of `host` (lowercase, no
    * trailing dot). PSL algorithm: among matching rules an exception
    * rule prevails (its suffix is the rule minus its leftmost label),
    * otherwise the rule with the most labels; no match → 1 (default
    * rule `*`).
    */
  def publicSuffixLabels(host: String): Int = {
    var nLabels = 1
    var i = 0
    while (i < host.length) {
      if (host.charAt(i) == '.') nLabels += 1
      i += 1
    }
    var best = 1
    var exception = -1
    var pos = 0 // start offset of the current candidate suffix
    var idx = 0 // label index of the candidate start (0 = whole host)
    // skip straight to the deepest candidate any rule could match:
    // bounded probes regardless of host label count
    while (nLabels - idx > maxKeyLabels) {
      val dot = host.indexOf('.', pos)
      if (dot < 0) return if (exception >= 0) exception else math.min(best, nLabels)
      pos = dot + 1
      idx += 1
    }
    var done = false
    while (!done) {
      val f = rules.get(if (pos == 0) host else host.substring(pos))
      if (f != null) {
        val len = nLabels - idx
        if ((f & Exception) != 0 && exception < 0) exception = len - 1
        if ((f & Normal) != 0 && len > best) best = len
        // "*.<key>" needs one extra label to the left of <key>
        if ((f & WildcardParent) != 0 && idx > 0 && len + 1 > best) best = len + 1
      }
      val dot = host.indexOf('.', pos)
      if (dot < 0) done = true
      else { pos = dot + 1; idx += 1 }
    }
    if (exception >= 0) exception else math.min(best, nLabels)
  }

  /** eTLD+1 (registrable domain) of a host, or null when the host IS a
    * public suffix (Go's EffectiveTLDPlusOne returns an error there and
    * the reference drops the record) or carries an empty label.
    * Divergence (documented): ONE trailing dot (the FQDN form) is
    * normalized away rather than rejected like Go — DNS-legal input
    * shouldn't change the registrable domain.
    */
  def etld1(host: String): String = {
    if (host == null || host.isEmpty) return null
    var h = if (host.charAt(host.length - 1) == '.') host.dropRight(1) else host
    if (h.isEmpty) return null
    // Go's EffectiveTLDPlusOne errors on any empty label (leading dot,
    // "..", trailing dot) — here that maps to null. Without this check
    // ".com" would come back AS ".com" and "foo..com" as ".com":
    // malformed registrable domains leaking into compaction keys.
    if (h.charAt(0) == '.' || h.charAt(h.length - 1) == '.' || h.contains(".."))
      return null
    // Locale.ROOT: under a Turkish default locale, toLowerCase maps
    // 'I' to dotless 'ı' and every .IO/.GITHUB.IO host would miss the
    // rules table and come back mojibake
    h = h.toLowerCase(java.util.Locale.ROOT)
    val ps = publicSuffixLabels(h)
    // find the start of the last ps+1 labels
    var dotsToSkip = ps // dots from the right to step past
    var i = h.length - 1
    while (i >= 0 && dotsToSkip > 0) {
      if (h.charAt(i) == '.') dotsToSkip -= 1
      i -= 1
    }
    if (dotsToSkip > 0) return null // host has only ps labels: is a suffix
    // i now sits left of the dot that precedes the suffix; scan to the
    // previous dot (or string start) for the +1 label
    while (i >= 0 && h.charAt(i) != '.') i -= 1
    h.substring(i + 1)
  }

  /** Codegen entry point ([[Etld1]] calls this per row). */
  def etld1Utf8(host: UTF8String): UTF8String = {
    val r = etld1(host.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  /** Driver-side (registrable domain, subdomain) split — the LinkDb
    * request parser (reference controller.go:39 splitDomain). Total on
    * purpose: a host that IS a public suffix returns (host, "") so the
    * serving path can answer with zero rows instead of erroring.
    */
  def splitDomain(host: String): (String, String) = {
    val h = host.toLowerCase(java.util.Locale.ROOT).stripSuffix(".")
    val e = etld1(h)
    if (e == null || e.length >= h.length) (h, "")
    else (e, h.substring(0, h.length - e.length - 1))
  }
}

/** `etld1(host)` as a Catalyst expression: one static-call row-local
  * lookup, inlined into WholeStageCodegen (no join against a suffix
  * table, no UDF). NULL when the input is NULL or the host is itself a
  * public suffix.
  */
case class Etld1(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "etld1"

  override protected def nullSafeEval(input: Any): Any =
    PublicSuffixList.etld1Utf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      UTF8String ${ev.value} = null;
      if (!${c.isNull}) {
        ${ev.value} = graft.functions.PublicSuffixList.etld1Utf8(${c.value});
        ${ev.isNull} = ${ev.value} == null;
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Etld1 =
    copy(child = newChild)
}

object Etld1 {
  def of(c: Column): Column = CB.column(Etld1(CB.expression(c)))
}
