package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("q01 aggregates reconcile with raw scan") {
    val res = Relational.q01_agg.run(spark, sfDir).collect()
    assert(res.nonEmpty)
    val totalRows = res.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.table(spark, sfDir, "lineitem")
      .filter(col("l_shipdate").cast("date") <= lit("1998-09-02")).count()
    assert(totalRows == expected)
  }

  test("q03 top-k is sorted desc and bounded") {
    val rows = Relational.q03_topk.run(spark, sfDir).collect()
    assert(rows.length == 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("q04/q05 semi and anti joins partition orders-customers correctly") {
    val semi = Relational.q04_semijoin.run(spark, sfDir)
    val bigQtyOrders = Tables.table(spark, sfDir, "lineitem")
      .filter(col("l_quantity") > 49).select(col("l_orderkey")).distinct().count()
    assert(semi.count() == bigQtyOrders)

    val anti = Relational.q05_antijoin.run(spark, sfDir)
    val withRecent = Tables.table(spark, sfDir, "orders")
      .filter(col("o_orderdate").cast("date") >= lit("1997-01-01"))
      .select(col("o_custkey")).distinct().count()
    val allCust = Tables.table(spark, sfDir, "customer").count()
    assert(anti.count() == allCust - withRecent)
  }

  test("q07 emits at most 3 ranked rows per customer") {
    val df = Relational.q07_window_rank.run(spark, sfDir)
    assert(df.groupBy("o_custkey").count().filter(col("count") > 3).count() == 0)
    assert(df.filter(col("rk") < 1 || col("rk") > 3).count() == 0)
  }

  test("q09 rollup grand total equals table count") {
    val all = Relational.q09_rollup.run(spark, sfDir)
      .filter(col("returnflag") === "ALL" && col("linestatus") === "ALL")
      .collect()
    assert(all.length == 1)
    assert(all.head.getAs[Long]("n") == Tables.table(spark, sfDir, "lineitem").count())
  }

  test("q06 filter reaches the parquet scan (pushdown)") {
    val plan = Relational.q06_filter_pushdown.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), "expected parquet PushedFilters")
    assert(plan.contains("l_discount"), "expected l_discount in pushed filters")
  }
}
