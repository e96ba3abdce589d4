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

  /** Sort key picking the "shortest page variant" deterministically:
    * (len(path), len(query), path, query) as one sortable string.
    */
  private[operators] val variantKey =
    "concat(lpad(cast(length(page_path) as string), 4, '0'), " +
      "lpad(cast(length(page_rawquery) as string), 4, '0'), page_path, '|', page_rawquery)"

  /** "Latest record" key: full-line sort order, ip included so the
    * winner is deterministic under any row order.
    */
  private[operators] val lineKey =
    "concat_ws('|', page_path, page_rawquery, link_text, date_from, ip)"

  /** Input: raw link rows (WatSource.links or Tables.links schema).
    * Output: one row per (domain, subdomain, path, query, page_host),
    * full compacted-store schema.
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
        expr(s"max_by(ip, $lineKey)").as("ip"),
        expr(s"min_by(page_path, $variantKey)").as("page_path"),
        expr(s"min_by(page_rawquery, $variantKey)").as("page_rawquery"),
        expr(s"min_by(page_scheme, $variantKey)").as("page_scheme"),
        sum(col("qty")).cast("bigint").as("qty"))
}
