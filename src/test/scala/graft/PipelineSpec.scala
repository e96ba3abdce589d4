package graft

import graft.api.LinkDbRequest
import java.nio.file.Files

class PipelineSpec extends SparkSpec {

  test("WAT segments import end-to-end and serve LinkDB queries") {
    // reuse the WatSourceSpec fixture generator through a fresh instance
    val fixture = new WatSourceSpec {}.fixturePath
    val out = Files.createTempDirectory("graftstore").toString
    val stats = Pipeline.importSegments(spark, Seq(fixture), out,
      ignoreDomains = Seq("ignored.example"))
    // 4 valid pages (sitea, b.org, canon, blog.user.github.io) and 6
    // kept links: 2 + 1 + 1 + 2 (see the WatSourceSpec fixture)
    assert(stats.pages == 4)
    assert(stats.links == 6)
    assert(stats.compacted == 6)
    assert(stats.domains == 6)

    // the store answers the reference's API contract
    val db = Pipeline.linkDb(spark, out, "ext2.co.uk")
    val out1 = db.query(LinkDbRequest("ext2.co.uk"))
    assert(out1.length == 1)
    assert(out1.head.linkUrl == "https://sub.ext2.co.uk/x?q=1")
    assert(out1.head.noFollow == 1)

    // idempotent re-import (the reference's .imported marker semantics)
    val stats2 = Pipeline.importSegments(spark, Seq(fixture), out)
    assert(stats2.compacted == stats.compacted)
  }

  test("multi-segment import reads every WAT file") {
    val fixture = new WatSourceSpec {}.fixturePath
    // second segment = a copy of the first under a different name
    val seg2 = java.nio.file.Files.createTempDirectory("wat2")
      .resolve("seg2.wat.gz")
    java.nio.file.Files.copy(java.nio.file.Paths.get(fixture), seg2)
    val out = Files.createTempDirectory("graftstore2").toString
    val stats = Pipeline.importSegments(spark, Seq(fixture, seg2.toString), out)
    assert(stats.pages == 8, "both segments' pages must load")
    assert(stats.links == 12, "raw link count doubles with the duplicated segment")
    assert(stats.compacted == 6, "compaction merges the duplicate segment's rows")
  }

  test("linkDb prunes the store by eTLD+1 so subdomain requests work") {
    val fixture = new WatSourceSpec {}.fixturePath
    val out = Files.createTempDirectory("graftstore3").toString
    Pipeline.importSegments(spark, Seq(fixture), out)
    val viaSub = Pipeline.linkDb(spark, out, "sub.ext2.co.uk")
      .query(LinkDbRequest("sub.ext2.co.uk"))
    assert(viaSub.length == 1, "subdomain-qualified request must hit the eTLD+1 partition")
    assert(viaSub.head.linkUrl == "https://sub.ext2.co.uk/x?q=1")
  }
}
