package graft

import graft.functions.UrlFns
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's OWN unit-test vectors
  * (kris-dev-hub/globallinks pkg/commoncrawl/wat_test.go), replayed
  * against our Column functions — the direct "matches the reference's
  * results on its own test queries" check.
  */
class ReferenceParitySpec extends SparkSpec {

  import spark.implicits._

  private def eval1[T](in: Seq[String], f: Column => Column): Seq[T] =
    in.toDF("v").select(f(col("v"))).collect().toSeq.map(_.get(0).asInstanceOf[T])

  test("TestValidateHost vectors (wat_test.go:14-35)") {
    val got = eval1[Boolean](
      Seq("example.com", "localhost", "192.168.0.1", "example.com%"),
      UrlFns.isValidHost)
    assert(got == Seq(true, false, false, false))
  }

  test("TestGenSubdomain vector (wat_test.go:215-224)") {
    val sub = Seq(("www.test.com", "test.com")).toDF("h", "d")
      .select(UrlFns.subdomainOf(col("h"), col("d"))).head().getString(0)
    assert(sub == "www")
    assert(UrlFns.splitDomain("www.test.com") == (("test.com", "www")))
  }

  test("EffectiveTLDPlusOne parity: full PSL (wat.go:664 publicsuffix)") {
    // vectors a Go publicsuffix.EffectiveTLDPlusOne caller would see —
    // private suffixes, wildcard + exception rules, punycode IDN
    val vectors = Seq(
      ("www.example.com", "example.com", "www"),
      ("a.b.example.co.uk", "example.co.uk", "a.b"),
      ("blog.user.github.io", "user.github.io", "blog"), // PRIVATE section
      ("www.site.com.pl", "site.com.pl", "www"),
      ("s.example.co.kr", "example.co.kr", "s"),
      ("foo.bar.ck", "foo.bar.ck", null), // wildcard *.ck
      ("x.www.ck", "www.ck", "x"), // exception !www.ck
      ("media.city.kawasaki.jp", "city.kawasaki.jp", "media"), // !city.kawasaki.jp
      ("sub.foo.nagoya.jp", "sub.foo.nagoya.jp", null), // wildcard *.nagoya.jp
      ("example.xn--p1ai", "example.xn--p1ai", null), // punycode of рф
      ("github.io", null, null), // bare suffix: no registrable domain
      ("com", null, null),
      ("MiXeD.CaSe.ExAmPlE.cOm", "example.com", null),
      // empty labels → null (Go errors); single trailing dot normalizes
      (".com", null, null),
      ("foo..com", null, null),
      ("a.com..", null, null),
      ("example.com.", "example.com", null),
      // deep junk host: probing is bounded by the deepest rule
      ("a." * 40 + "example.com", "example.com", null))
    for ((host, want, _) <- vectors)
      assert(graft.functions.PublicSuffixList.etld1(host) == want, s"etld1($host)")
    // the same table through the Column expression (codegen path)
    val got = eval1[String](vectors.map(_._1), UrlFns.etld1)
    assert(got == vectors.map(_._2), "Column-side etld1")
    // driver-side splitDomain agrees on the subdomain part
    for ((host, e, sub) <- vectors if sub != null)
      assert(UrlFns.splitDomain(host) == ((e, sub)), s"splitDomain($host)")
    // bare-suffix requests stay total: (host, "")
    assert(UrlFns.splitDomain("github.io") == (("github.io", "")))
  }

  test("TestSetScheme vectors (wat_test.go:288-308)") {
    val got = eval1[String](Seq("https", "http", "ftp", ""), UrlFns.schemeCode)
    assert(got == Seq("2", "1", "0", "0"))
  }

  test("TestBuildURLRecord vectors (wat_test.go:478-521)") {
    val u = "http://example.com/path?query=1#fragment"
    val row = Seq(u).toDF("u").select(
      UrlFns.schemeCode(UrlFns.urlScheme(col("u"))),
      UrlFns.urlHost(col("u")),
      UrlFns.urlPath(col("u")),
      UrlFns.urlRawQuery(col("u")),
      UrlFns.urlFragment(col("u")),
      UrlFns.etld1(UrlFns.urlHost(col("u"))),
      UrlFns.subdomainOf(UrlFns.urlHost(col("u")), UrlFns.etld1(UrlFns.urlHost(col("u"))))
    ).head()
    assert(row.toSeq == Seq("1", "example.com", "/path", "query=1", "fragment",
      "example.com", ""))
    // "Invalid URL - Contains New Line"
    val bad = eval1[Boolean](Seq("http://example.com/path\n?query=1#fragment", u),
      UrlFns.isParseableUrl)
    assert(bad == Seq(false, true))
  }

  test("TestVerifyRecordQuality vectors (wat_test.go:522-573)") {
    // cn TLD rejected
    assert(eval1[Boolean](Seq("example.cn", "example.com"), UrlFns.hasIgnoredTld)
      == Seq(true, false))
    // query over 200 BYTES rejected, pipe char rejected — via the SAME
    // predicate WatSource applies (UrlFns.isQualityQuery). The
    // multibyte probe pins byte semantics: 101 two-byte chars = 202
    // bytes > 200, though only 101 characters (Go len() counts bytes).
    val longQ = "query=value&a=" + "s" * 200
    val got = eval1[Boolean](
      Seq("query=value", longQ, "a|b", "é" * 101), UrlFns.isQualityQuery)
    assert(got == Seq(true, false, false, false))
    // broken host
    assert(eval1[Boolean](Seq("www.examp[le.com"), UrlFns.isValidHost) == Seq(false))
  }

  test("TestIgnoreQuery vectors (wat_test.go:388-409)") {
    val got = eval1[String](
      Seq("lang=en", "utm_source=google", "ref=123", "page=1", "category=books"),
      UrlFns.cleanQuery)
    assert(got == Seq("", "", "", "page=1", "category=books"))
  }

  test("TestIgnoreTLD vectors (wat_test.go:410-431)") {
    val got = eval1[Boolean](
      Seq("example.cn", "website.com", "info.co.uk", "site.cn", "domain.com.cn"),
      UrlFns.hasIgnoredTld)
    assert(got == Seq(true, false, false, true, true))
  }

  test("TestIsIgnoredExtension vectors (wat_test.go:432-455)") {
    val got = eval1[Boolean](
      Seq("/image.jpg", "/document.pdf", "/script.php", "/photo.jpeg", "/test", "/picture.JPG"),
      UrlFns.hasIgnoredExtension)
    assert(got == Seq(true, true, false, true, false, true))
  }

  test("TestExtractWatFileNumber vectors (wat_test.go:261-287)") {
    val got = eval1[String](
      Seq("example-123.warc.wat.gz", "test-456.warc.wat.gz",
        "invalidfile.txt", "no-number.warc.wat.gz"),
      graft.sources.WatSource.watFileNumber)
    assert(got == Seq("123", "456", "", ""))
  }

  test("TestSortFileLink order (wat_test.go:225-260): domain, subdomain, path") {
    val rows = Seq(
      ("a", "example.org", "www", "/path1"),
      ("b", "example.org", "app", "/path2"),
      ("c", "example.com", "www", "/path3"))
      .toDF("key", "link_domain", "link_subdomain", "link_path")
      .orderBy(col("link_domain"), col("link_subdomain"), col("link_path"))
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("c", "b", "a"))
  }

  test("TestGetNoFollowNoIndex vectors (wat_test.go:620-669)") {
    // replay through the same exists() predicate WatSource.pages uses
    def flags(metas: Seq[(String, String)]): (Int, Int) = {
      val df = Seq(metas).toDF("metas")
      val r = df.select(
        when(exists(col("metas"), m =>
          m.getField("_1") === "robots" && m.getField("_2").contains("noindex")), 1)
          .otherwise(0),
        when(exists(col("metas"), m =>
          m.getField("_1") === "robots" && m.getField("_2").contains("nofollow")), 1)
          .otherwise(0)).head()
      (r.getInt(0), r.getInt(1))
    }
    assert(flags(Seq(("robots", "noindex, nofollow"))) == ((1, 1)))
    assert(flags(Seq(("robots", "noindex"))) == ((1, 0)))
    assert(flags(Seq(("robots", "nofollow"))) == ((0, 1)))
    assert(flags(Seq(("robots", "index, follow"))) == ((0, 0)))
    assert(flags(Seq(("viewport", "width=device-width"))) == ((0, 0)))
  }
}
