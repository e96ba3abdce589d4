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
    assert(stats.pages == 3)
    assert(stats.links == 4)
    assert(stats.compacted == 4)
    assert(stats.domains == 4)

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
}
