package graft.sources

import java.io.FileOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

/** Deterministic segment-manifest fixture for the s09 streaming
  * ingestion query — the driver's harness passes only a parquet
  * `sfDir`, so the manifest-watching import gets its input from here
  * (the WarcFixture pattern): a Common Crawl-layout tree of
  * `segments/<id>/part.wat.gz` WAT files plus a `manifest/` directory
  * holding the wat.paths fragment the stream watches, materialized
  * once under the JVM temp dir with the same atomic-move `_OK`
  * protocol as [[WarcFixture]] (Verify and Bench may race from
  * separate JVMs).
  *
  * Segment ids follow the reference's `<crawl>.<ordinal>` shape
  * (wat.go:209), so ordinal-based selection works on them too. Each
  * segment's pages/links differ deterministically per segment, so a
  * cross-segment mix-up (wrong file into wrong store) changes counts
  * and turns the oracle red.
  */
object ManifestFixture {

  val Segments = 3
  val PagesPerSegment = 12
  val LinksPerPage = 3
  val ExtDomains = 17

  /** Bump when SegmentIngest / the per-segment import protocol changes
    * semantics — part of [[ingestedStore]]'s cache key.
    */
  val IngestProtocolVersion = 3

  private def watLine(uri: String, ip: String, date: String,
      links: Seq[(String, String)]): String = {
    val linksJson = links.map { case (url, text) =>
      s"""{"path":"A@/href","url":"$url","text":"$text","rel":""}"""
    }.mkString("[", ",", "]")
    s"""{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":"$uri","WARC-IP-Address":"$ip","WARC-Date":"$date"},""" +
      s""""Payload-Metadata":{"HTTP-Response-Metadata":{"HTML-Metadata":{"Head":{"Title":"t","Metas":[{"name":"viewport","content":"x"}],"Link":[]},"Links":$linksJson}}}}}"""
  }

  private def segmentWat(seg: Int, pages: Int = PagesPerSegment,
      links: Int = LinksPerPage, extDomains: Int = ExtDomains): String = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\n") // header noise the parser must skip
    (0 until pages).foreach { i =>
      val host = s"www.seg$seg-site$i.com"
      val linkSeq = (0 until links).map { k =>
        val d = (i * 5 + seg * 7 + k) % extDomains
        (s"http://ext$d-site.org/s$seg/p$k?id=$k", s"anchor $k")
      } :+ ((s"http://$host/self", "internal")) // same host -> dropped
      sb.append(watLine(s"http://$host/page$i.html", s"10.$seg.$i.1",
        f"2024-07-${(i % 28) + 1}%02dT09:00:00Z", linkSeq)).append('\n')
    }
    sb.append("{ not json — parser must skip\n")
    sb.toString
  }

  /** Parameterized sibling of [[dir]] for scale/cluster rehearsals:
    * same Common Crawl layout, its own param-keyed cache dir, and the
    * manifest additionally SPLIT into `fragments/frag<i>.paths` files
    * so a rehearsal can land fragments progressively into a watched
    * directory (the crawler-publishes-while-importer-runs shape).
    * `manifest/wat.paths` still carries the full list for batch-parity
    * imports.
    */
  def scaledDir(segments: Int, pages: Int, links: Int, fragments: Int): String = synchronized {
    require(fragments >= 1 && fragments <= segments,
      s"fragments must be in [1, $segments], got $fragments")
    val tmpRoot = java.nio.file.Paths.get(sys.props("java.io.tmpdir"))
    val base = tmpRoot.resolve(
      s"graft-manifest-fixture-s$segments-p$pages-l$links-f$fragments-v$IngestProtocolVersion")
    val ok = base.resolve("_OK")
    if (java.nio.file.Files.exists(ok)) return base.toAbsolutePath.toString
    val build = java.nio.file.Files.createTempDirectory(tmpRoot, "graft-manifest-scaled")
    val paths = (0 until segments).map { seg =>
      val segDir = build.resolve(s"segments/1687.$seg")
      java.nio.file.Files.createDirectories(segDir)
      val f = segDir.resolve("part.wat.gz")
      val g = new GZIPOutputStream(new FileOutputStream(f.toFile))
      try g.write(segmentWat(seg, pages, links).getBytes(UTF_8)) finally g.close()
      base.resolve(s"segments/1687.$seg/part.wat.gz").toAbsolutePath.toString
    }
    java.nio.file.Files.createDirectories(build.resolve("manifest"))
    java.nio.file.Files.writeString(build.resolve("manifest/wat.paths"),
      paths.mkString("# graft scaled fixture manifest\n", "\n", "\n"))
    java.nio.file.Files.createDirectories(build.resolve("fragments"))
    paths.grouped(math.max(1, math.ceil(segments.toDouble / fragments).toInt))
      .zipWithIndex.foreach { case (slice, i) =>
        java.nio.file.Files.writeString(
          build.resolve(f"fragments/frag$i%02d.paths"),
          slice.mkString("", "\n", "\n"))
      }
    java.nio.file.Files.createFile(build.resolve("_OK"))
    val moved =
      try {
        java.nio.file.Files.move(build, base,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        true
      } catch { case _: java.io.IOException => false }
    if (moved) base.toAbsolutePath.toString
    else if (java.nio.file.Files.exists(ok)) base.toAbsolutePath.toString
    else throw new IllegalStateException(
      s"scaled fixture build race left no usable dir at $base")
  }

  /** Materialize (once) and return the fixture root: `segments/…`
    * WAT files + `manifest/wat.paths` with absolute paths.
    */
  def dir(): String = synchronized {
    val tmpRoot = java.nio.file.Paths.get(sys.props("java.io.tmpdir"))
    val base = tmpRoot.resolve("graft-manifest-fixture-v2")
    val ok = base.resolve("_OK")
    if (java.nio.file.Files.exists(ok)) return base.toAbsolutePath.toString
    val build = java.nio.file.Files.createTempDirectory(tmpRoot, "graft-manifest-build")
    val paths = (0 until Segments).map { seg =>
      val segDir = build.resolve(s"segments/1687.$seg")
      java.nio.file.Files.createDirectories(segDir)
      val f = segDir.resolve("part.wat.gz")
      val g = new GZIPOutputStream(new FileOutputStream(f.toFile))
      try g.write(segmentWat(seg).getBytes(UTF_8)) finally g.close()
      // the manifest records the CANONICAL location (post-move), so
      // fragments stay valid after the atomic rename
      base.resolve(s"segments/1687.$seg/part.wat.gz").toAbsolutePath.toString
    }
    java.nio.file.Files.createDirectories(build.resolve("manifest"))
    java.nio.file.Files.writeString(build.resolve("manifest/wat.paths"),
      paths.mkString("# graft fixture manifest\n", "\n", "\n"))
    java.nio.file.Files.createFile(build.resolve("_OK"))
    val moved =
      try {
        java.nio.file.Files.move(build, base,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        true
      } catch { case _: java.io.IOException => false }
    if (moved) base.toAbsolutePath.toString
    else if (java.nio.file.Files.exists(ok)) { // racer completed first
      deleteRecursively(build)
      base.toAbsolutePath.toString
    } else {
      // private complete build: the manifest was written with the
      // canonical post-move paths — retarget it at this build's own
      // files so the fixture stays self-consistent
      java.nio.file.Files.writeString(build.resolve("manifest/wat.paths"),
        (0 until Segments)
          .map(seg => build.resolve(s"segments/1687.$seg/part.wat.gz").toAbsolutePath.toString)
          .mkString("# graft fixture manifest\n", "\n", "\n"))
      build.toAbsolutePath.toString
    }
  }

  /** The STREAM-INGESTED store for s09: run the manifest-watching
    * import once (AvailableNow drain of the fixture's manifest dir)
    * and cache the resulting store under an `_OK`-marked directory —
    * bench trials and the Verify pass re-read it instead of
    * re-importing. Same atomic-move discipline as [[dir]].
    */
  def ingestedStore(spark: org.apache.spark.sql.SparkSession): String = synchronized {
    val tmpRoot = java.nio.file.Paths.get(sys.props("java.io.tmpdir"))
    // cache key derives from the fixture parameters + an explicit
    // ingest-protocol version, so a parameter or protocol change
    // structurally invalidates the cached store — a fixed name would
    // silently serve a stale store to s09 and its oracle dump after
    // any change that forgets to bump it by hand
    val base = tmpRoot.resolve(
      s"graft-manifest-ingest-p$IngestProtocolVersion" +
        s"-s$Segments-p$PagesPerSegment-l$LinksPerPage-d$ExtDomains")
    val ok = base.resolve("_OK")
    if (java.nio.file.Files.exists(ok)) return s"${base.toAbsolutePath}/store"
    val fixture = dir()
    val build = java.nio.file.Files.createTempDirectory(tmpRoot, "graft-ingest-build")
    val q = graft.streaming.SegmentIngest.start(spark,
      s"$fixture/manifest",
      s"$build/store",
      s"$build/checkpoint",
      availableNow = true)
    q.awaitTermination()
    require(SegmentManifest.completedSegments(spark, s"$build/store").size == Segments,
      s"stream ingest incomplete under $build/store")
    java.nio.file.Files.createFile(build.resolve("_OK"))
    val moved =
      try {
        java.nio.file.Files.move(build, base,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        true
      } catch { case _: java.io.IOException => false }
    val root =
      if (moved) base
      else if (java.nio.file.Files.exists(ok)) { deleteRecursively(build); base }
      else build
    s"${root.toAbsolutePath}/store"
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
