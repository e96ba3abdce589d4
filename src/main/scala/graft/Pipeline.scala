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
    val pages = WatSource.pages(spark, watPaths)
    val links = WatSource.links(spark, watPaths, ignoreDomains)
    val compacted = LinkCompaction.compact(links)
    LinkStore.write(compacted, s"$outDir/links")
    pages
      .select(col("page_host"), col("page_path"), col("page_rawquery"),
        col("page_scheme"), col("title"), col("ip"), col("crawl_date"),
        col("noindex"), col("page_nofollow"))
      .write.mode("overwrite").parquet(s"$outDir/pages")
    if (stats) {
      // all counts come from the MATERIALIZED stores: compaction sums
      // qty, so sum(qty) over the store IS the raw link count — no
      // third pass over the WAT files just for monitoring numbers
      val stored = LinkStore.read(spark, s"$outDir/links")
      val (nCompacted, nLinks, nDomains) = {
        val r = stored.agg(count(lit(1)), sum(col("qty")),
          countDistinct(col("link_domain"))).head()
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1), r.getLong(2))
      }
      ImportStats(
        pages = spark.read.parquet(s"$outDir/pages").count(),
        links = nLinks,
        compacted = nCompacted,
        domains = nDomains)
    } else ImportStats(-1, -1, -1, -1)
  }

  /** Continuous ingestion: watch a directory for new WAT files and
    * micro-batch them through the SAME extraction + compaction plan as
    * batch import. Each micro-batch compacts within itself and writes
    * an OVERWRITE into its own `batch=<id>` partition — so an
    * at-least-once replay after a crash rewrites the same partition
    * instead of double-counting (foreachBatch is at-least-once; the
    * batchId is the idempotency key). Uses foreachBatch because
    * full-history compaction as a streaming aggregate would hold
    * unbounded state.
    *
    * Read the result with [[streamedLinks]] (cross-batch duplicates
    * merge at query time, as the reference's API does) or fold it into
    * the main bucketed store with [[compactStream]].
    */
  def streamImport(
      spark: SparkSession,
      watchDir: String,
      outDir: String,
      checkpoint: String,
      ignoreDomains: Seq[String] = Nil): org.apache.spark.sql.streaming.StreamingQuery = {
    val lines = spark.readStream
      .option("maxFilesPerTrigger", 8)
      .text(watchDir)
      .toDF("line")
    WatSource.linksFromLines(lines, ignoreDomains)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        LinkCompaction.compact(batch)
          .write.mode("overwrite")
          .parquet(s"$outDir/links_stream/batch=$batchId")
      }
      .start()
  }

  /** All streamed links (the `batch` partition column is dropped; rows
    * across batches may share a compaction key until [[compactStream]]
    * folds them).
    */
  def streamedLinks(spark: SparkSession, outDir: String): DataFrame =
    spark.read.option("basePath", s"$outDir/links_stream")
      .parquet(s"$outDir/links_stream").drop("batch")

  /** Fold the streamed batches plus any existing main store into a
    * freshly compacted main store — the periodic re-compaction pass.
    * NOTE: the caller owns deleting `links_stream` afterwards (this
    * library never removes data); folding the same stream batches twice
    * double-counts their qty, as StreamImportSpec demonstrates.
    */
  def compactStream(spark: SparkSession, outDir: String): Unit = {
    val streamed = streamedLinks(spark, outDir)
    val existing =
      try Some(LinkStore.read(spark, s"$outDir/links").drop("domain_bucket"))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    val all = existing.fold(streamed)(e => streamed.unionByName(e))
    // materialize before overwriting the directory we read from
    val compacted = LinkCompaction.compact(all).localCheckpoint()
    LinkStore.write(compacted, s"$outDir/links")
  }

  /** Query surface over an imported store — the LinkDB API bound to a
    * domain-pruned read. The store keys `link_domain` by eTLD+1, so the
    * pruning predicate uses the request's registrable domain; the
    * subdomain part of the request is applied by LinkDb.query itself.
    */
  def linkDb(spark: SparkSession, outDir: String, domain: String): api.LinkDb = {
    val (etld1, _) = graft.functions.UrlFns.splitDomain(domain)
    new api.LinkDb(LinkStore.readDomain(spark, s"$outDir/links", etld1))
  }

  /** Full store scan (for analytics over all domains). */
  def links(spark: SparkSession, outDir: String): DataFrame =
    LinkStore.read(spark, s"$outDir/links")
}
