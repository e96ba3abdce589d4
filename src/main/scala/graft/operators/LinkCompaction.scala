package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's "aggressive compaction" (cmd/importer/main.go:567-609)
  * as ONE hash aggregate over the 5-column merge key.
  *
  * The Go version requires a pre-sorted file and a sequential merge
  * pass; the Spark version needs neither — every merge rule is an
  * aggregate function, so map-side partial aggregation collapses most
  * duplicates before the (single) shuffle, and the plan scales linearly
  * with input at any cluster size:
  *   - dofollow wins over nofollow        → min(nofollow)
  *   - widest date range                  → min(date_from) / max(date_to)
  *   - IP of the lexically-latest record  → max_by(ip, lineKey)
  *   - shortest page path/query variant   → min_by(col, variantKey)
  *   - merged row count                   → sum(qty)
  *
  * INTENTIONAL DIVERGENCE (qty): the reference's compareRecords
  * (cmd/importer/main.go) increments Qty only when the incoming row's
  * page path/query VARIANT differs from the previous one, so repeated
  * identical variants don't count. Here qty = sum of merged rows:
  * counting distinct variants per group is a second distinct-aggregate
  * (extra shuffle) for a statistic the API only surfaces as "seen
  * more than once", and sum(qty) — unlike the variant count — stays
  * re-mergeable across incremental compaction runs (compact(compact(a)
  * ∪ b) keeps exact counts). Like the LinkDb date-range fix, this is a
  * deliberate semantic choice, not an oversight.
  */
object LinkCompaction {

  /** Input: raw link rows (WatSource.links or Tables.links schema).
    * Output: one row per (domain, subdomain, path, query, page_host),
    * full compacted-store schema.
    *
    * The four winner columns ride ONE [[graft.plans.CompactWinner]]
    * aggregate — a TypedImperativeAggregate, so the whole aggregate
    * lowers to ObjectHashAggregateExec (hash-based partial + final,
    * single exchange, no Sort) instead of the SortAggregate that the
    * declarative `min_by`/`max_by` string buffers force; both ordering
    * keys are built once per input row instead of per comparison.
    */
  def compact(links: DataFrame): DataFrame =
    links
      .groupBy(col("link_domain"), col("link_subdomain"), col("link_path"),
        col("link_rawquery"), col("page_host"))
      .agg(
        min(col("link_scheme")).as("link_scheme"),
        min(col("link_text")).as("link_text"),
        min(col("nofollow")).as("nofollow"),
        min(col("noindex")).as("noindex"),
        min(col("date_from")).as("date_from"),
        max(col("date_to")).as("date_to"),
        graft.plans.CompactWinner.of(
          col("page_path"), col("page_rawquery"), col("page_scheme"),
          col("link_text"), col("date_from"), col("ip")).as("_w"),
        sum(col("qty")).cast("bigint").as("qty"))
      .select(
        col("link_domain"), col("link_subdomain"), col("link_path"),
        col("link_rawquery"), col("page_host"),
        col("link_scheme"), col("link_text"), col("nofollow"), col("noindex"),
        col("date_from"), col("date_to"),
        col("_w.ip").as("ip"),
        col("_w.page_path").as("page_path"),
        col("_w.page_rawquery").as("page_rawquery"),
        col("_w.page_scheme").as("page_scheme"),
        col("qty"))
}
