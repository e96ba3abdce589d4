package graft.operators

import graft.GraftQuery
import graft.sources.{WarcFixture, WarcSource}
import org.apache.spark.sql.functions._

/** §2B (continued) — the raw-WARC ingestion chain surfaced as a
  * driver-checked query: WARC bytes → streaming record framing →
  * HTML link reconstruction → the SAME refinePages/linksFromPages
  * rule chain the WAT path runs (reference: pkg/commoncrawl/wat.go;
  * the reference itself has no raw-WARC path) → per-domain link
  * rollup. The driver can only hand us a parquet `sfDir`, so the
  * WARC bytes come from the deterministic [[WarcFixture]]; rows-only
  * correctness (DuckDB cannot read WARC), with the exact row/count
  * pins in WarcSourceSpec.
  */
object WarcOps {

  val q59_warc_links: GraftQuery = GraftQuery(
    "q59_warc_links",
    // sfDir intentionally unused: the input is raw WARC bytes
    (s, _) => {
      val d = WarcFixture.dir()
      WarcSource.links(s, Seq(d))
        .groupBy(col("link_domain"))
        .agg(
          sum(col("qty")).as("qty"),
          countDistinct(col("page_host")).as("n_src_hosts"),
          countDistinct(col("link_path")).as("n_paths"))
    },
    None // raw-WARC input — no parquet table for a DuckDB oracle
  )

  /** q59's DRIVER-GATED companion (the q30_verify dump pattern): DuckDB
    * cannot read WARC, but the POST-EXTRACTION link rows are plain
    * columns — dump them to a dir-keyed path and run the per-domain
    * rollup from the dump in BOTH engines, so the aggregation semantics
    * carry a full rows+schema+hash oracle while the WARC framing +
    * HTML extraction stay pinned record-by-record in WarcSourceSpec.
    */
  val q59_verify: GraftQuery = GraftQuery(
    "q59_verify",
    (s, dir) => {
      val dump = graft.Tables.oracleDumpPath("q59_links", dir)
      val links = WarcSource.links(s, Seq(WarcFixture.dir()))
        .select(col("link_domain"), col("page_host"), col("link_path"), col("qty"))
      links.write.mode("overwrite").parquet(dump)
      graft.Tables.readBack(links, dump)
        .groupBy(col("link_domain"))
        .agg(
          sum(col("qty")).cast("bigint").as("qty"),
          countDistinct(col("page_host")).as("n_src_hosts"),
          countDistinct(col("link_path")).as("n_paths"))
    },
    Some(
      s"""SELECT link_domain, CAST(SUM(qty) AS BIGINT) AS qty,
         |  COUNT(DISTINCT page_host) AS n_src_hosts,
         |  COUNT(DISTINCT link_path) AS n_paths
         |FROM read_parquet('${graft.Tables.oracleDumpPath("q59_links", graft.Tables.VerifyDir)}/*.parquet')
         |GROUP BY link_domain""".stripMargin)
  )

  val all: Seq[GraftQuery] = Seq(q59_warc_links, q59_verify)
}
