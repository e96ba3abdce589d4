package graft

import org.apache.spark.sql.functions._
import graft.operators.LinkCompaction

/** The hash-compatible compaction winner aggregate
  * ([[graft.plans.CompactWinner]]) vs the declarative
  * `min_by`/`max_by` spelling it replaced: identical results on real
  * frames (including key edge cases the concat ordering keys create),
  * and the plan it buys — ObjectHashAggregate, no Sort.
  */
class CompactWinnerSpec extends SparkSpec {

  /** The pre-r13 declarative spelling, kept here as the differential
    * oracle for the TypedImperativeAggregate.
    */
  private def declarativeCompact(links: org.apache.spark.sql.DataFrame) = {
    val variantKey =
      "concat(lpad(cast(length(page_path) as string), 4, '0'), " +
        "lpad(cast(length(page_rawquery) as string), 4, '0'), page_path, '|', page_rawquery)"
    val lineKey =
      "concat_ws('|', page_path, page_rawquery, link_text, date_from, ip)"
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

  test("CompactWinner matches the declarative min_by/max_by spelling") {
    val links = Tables.links(spark, sfDir)
    val got = LinkCompaction.compact(links)
    val want = declarativeCompact(links).select(got.columns.map(col).toIndexedSeq: _*)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() == want.count())
  }

  test("CompactWinner matches on adversarial keys: pipes, empties, length ties") {
    import spark.implicits._
    // '|' inside fields exercises the CONCAT ordering contract (tuple
    // order and concat order disagree on these); equal-length variants
    // exercise the path/query tie-break; >1-group rows exercise merge.
    val rows = Seq(
      // (path, query, scheme, text, date, ip)
      ("/a|b", "", "2", "t", "2020-01-01", "1.1.1.1"),
      ("/a", "|b", "1", "t", "2020-01-01", "2.2.2.2"),
      ("/a", "b|", "1", "u", "2020-01-02", "3.3.3.3"),
      ("", "", "2", "t|x", "2020-01-01", "4.4.4.4"),
      ("/ab", "cd", "1", "t", "2020-01-03", "5.5.5.5"),
      ("/ab", "ce", "1", "t", "2020-01-03", "5.5.5.5"))
    val links = rows.zipWithIndex.toDF("r", "i").select(
      lit("d.com").as("link_domain"), lit("").as("link_subdomain"),
      lit("/p").as("link_path"), lit("").as("link_rawquery"),
      lit("h.org").as("page_host"),
      lit("1").as("link_scheme"), col("r._4").as("link_text"),
      lit(0).as("nofollow"), lit(0).as("noindex"),
      col("r._5").as("date_from"), col("r._5").as("date_to"),
      col("r._6").as("ip"), col("r._1").as("page_path"),
      col("r._2").as("page_rawquery"), col("r._3").as("page_scheme"),
      lit(1).as("qty"))
      .repartition(4) // forces partial buffers + serialize/merge
    val got = LinkCompaction.compact(links)
    val want = declarativeCompact(links).select(got.columns.map(col).toIndexedSeq: _*)
    assert(got.collect().toSeq == want.collect().toSeq)
  }

  test("compaction lowers to ObjectHashAggregate with no Sort") {
    val plan = LinkCompaction.compact(Tables.links(spark, sfDir))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    assert(!plan.contains("SortAggregate"))
    assert(!plan.contains("+- Sort"))
  }
}
