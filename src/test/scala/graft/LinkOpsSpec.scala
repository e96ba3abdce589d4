package graft

import graft.operators.LinkOps
import org.apache.spark.sql.functions._

class LinkOpsSpec extends SparkSpec {

  test("q17 compaction conserves row count into qty and prefers dofollow") {
    val links = Tables.links(spark, sfDir)
    val compact = LinkOps.q17_compact_links.run(spark, sfDir)
    assert(compact.agg(sum("qty")).head.getLong(0) == links.count())
    // dofollow-wins: a compacted group is nofollow only if EVERY variant was
    val mixed = links.groupBy("link_domain", "link_subdomain", "link_path",
        "link_rawquery", "page_host")
      .agg(min("nofollow").as("expect_nofollow"))
    val joined = compact.join(mixed,
      Seq("link_domain", "link_subdomain", "link_path", "link_rawquery", "page_host"))
    assert(joined.filter(col("nofollow") =!= col("expect_nofollow")).count() == 0)
  }

  test("q18 linkdb query paginates and merges deterministically") {
    val rows = LinkOps.q18_linkdb_query.run(spark, sfDir).collect()
    assert(rows.length <= 20)
    assert(rows.forall(_.getAs[String]("link_url").contains("d3.com")))
    val keys = rows.map(r => (r.getAs[String]("link_url"), r.getAs[String]("page_url")))
    assert(keys.distinct.length == keys.length, "merge must collapse duplicates")
  }

  test("q19 url parse round-trips scheme/host/path/query") {
    val rows = LinkOps.q19_url_parse.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (url, scheme, host) =
        (r.getAs[String]("url"), r.getAs[String]("scheme"), r.getAs[String]("host"))
      assert(scheme == "http" || scheme == "https")
      assert(url.startsWith(s"$scheme://$host"))
    }
  }

  test("url query extraction ignores '?' inside fragments (RFC 3986)") {
    import spark.implicits._
    import graft.functions.UrlFns
    val rows = Seq(
      "http://e.com/page#sec?x=1", // '?' only inside fragment -> no query
      "http://e.com/p?a=1#frag?b=2", // query ends at '#'
      "http://e.com/p?a=1",
      "http://e.com/plain").toDF("u")
      .select(UrlFns.urlRawQuery(col("u"))).collect().map(_.getString(0))
    assert(rows.toSeq == Seq("", "a=1", "a=1", ""))
  }

  test("q20 eTLD+1 honors multi-part suffixes") {
    val rows = LinkOps.q20_etld_domain.run(spark, sfDir).collect()
    val couk = rows.filter(_.getAs[String]("host").endsWith(".co.uk"))
    assert(couk.nonEmpty)
    couk.foreach { r =>
      val etld1 = r.getAs[String]("etld1")
      assert(etld1.endsWith(".co.uk") && etld1.count(_ == '.') == 2,
        s"bad etld1 $etld1 for host ${r.getAs[String]("host")}")
    }
    val www = rows.filter(_.getAs[String]("host").startsWith("www."))
    assert(www.forall(_.getAs[String]("subdomain") == "www"))
  }

  test("q21 quality gate classifies every injected verdict class") {
    val verdicts = LinkOps.q21_url_quality.run(spark, sfDir)
      .collect().map(_.getAs[String]("verdict")).toSet
    assert(verdicts == Set("ok", "no_dot", "ip_host", "bad_domain"))
  }

  test("q22 ignore lists drop blocked domains and asset paths") {
    val rows = LinkOps.q22_ignore_lists.run(spark, sfDir).collect()
    val domains = rows.map(_.getAs[String]("link_domain")).toSet
    assert(!domains.exists(Set("d3.com", "d5.com", "d7.co.uk")))
    assert(domains.nonEmpty)
  }

  test("q56 canonicalization folds every planted variant into its base URL") {
    val rows = LinkOps.q56_url_canonical.run(spark, sfDir).collect()
    val urls = rows.map(_.getAs[String]("canonical_url"))
    // no canonical URL retains a variant artifact
    urls.foreach { u =>
      assert(u == u.toLowerCase, s"uppercase survived: $u")
      assert(!u.contains("utm_") && !u.contains("fbclid") && !u.contains("gclid"),
        s"tracking param survived: $u")
      assert(!u.stripPrefix("https://").stripPrefix("http://").endsWith("/"),
        s"trailing slash survived: $u")
    }
    // every row of the (base + planted-variant) input is accounted for:
    // variants exist for src_key % 7 == 0, so totals must match
    val base = Tables.links(spark, sfDir)
    val expected = base.count() + base.filter(col("src_key") % 7 === 0).count()
    assert(rows.map(_.getAs[Long]("n_variants")).sum == expected)
    // and a URL that HAS a query keeps it (params other than tracking
    // survive canonicalization)
    assert(urls.exists(_.contains("?id=")), "legitimate params must survive")
  }
}
