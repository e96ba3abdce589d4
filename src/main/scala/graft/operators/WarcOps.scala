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

  val all: Seq[GraftQuery] = Seq(q59_warc_links)
}
