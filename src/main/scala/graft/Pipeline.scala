package graft

import graft.operators.LinkCompaction
import graft.sinks.LinkStore
import graft.sources.WatSource
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end import orchestration — the Spark equivalent of the
  * reference's `cmd/importer` + `cmd/storelinks` mains: WAT segments →
  * link extraction → aggressive compaction → domain-bucketed store,
  * plus the per-page record store.
  *
  * Where the Go importer runs file-at-a-time worker pools with
  * intermediate sorted text files (importer/main.go:150-260), here each
  * stage is one declarative plan over ALL segment files at once:
  * `spark.read.text(paths*)` makes every WAT file an input split, so
  * the same call scales from one fixture file to a full crawl's
  * segment list on a cluster. "Already imported" bookkeeping
  * (the reference's .imported marker files) becomes idempotent
  * overwrite of the bucketed store.
  */
object Pipeline {

  final case class ImportStats(
      pages: Long, links: Long, compacted: Long, domains: Long)

  /** Import WAT segments into a link store + page store at `outDir`.
    * Returns counts for monitoring (one extra action per count — call
    * with `stats = false` to skip them in production).
    */
  def importSegments(
      spark: SparkSession,
      watPaths: Seq[String],
      outDir: String,
      ignoreDomains: Seq[String] = Nil,
      stats: Boolean = true): ImportStats = {
    require(watPaths.nonEmpty, "no WAT segments given")
    val path = watPaths.mkString(",")
    val pages = WatSource.pages(spark, path)
    val links = WatSource.links(spark, path, ignoreDomains)
    val compacted = LinkCompaction.compact(links)
    LinkStore.write(compacted, s"$outDir/links")
    pages
      .select(col("page_host"), col("page_path"), col("page_rawquery"),
        col("page_scheme"), col("title"), col("ip"), col("crawl_date"),
        col("noindex"), col("page_nofollow"))
      .write.mode("overwrite").parquet(s"$outDir/pages")
    if (stats) {
      val stored = LinkStore.read(spark, s"$outDir/links")
      ImportStats(
        pages = spark.read.parquet(s"$outDir/pages").count(),
        links = links.count(),
        compacted = stored.count(),
        domains = stored.select(col("link_domain")).distinct().count())
    } else ImportStats(-1, -1, -1, -1)
  }

  /** Query surface over an imported store — the LinkDB API bound to a
    * domain-pruned read.
    */
  def linkDb(spark: SparkSession, outDir: String, domain: String): api.LinkDb =
    new api.LinkDb(LinkStore.readDomain(spark, s"$outDir/links", domain))

  /** Full store scan (for analytics over all domains). */
  def links(spark: SparkSession, outDir: String): DataFrame =
    LinkStore.read(spark, s"$outDir/links")
}
