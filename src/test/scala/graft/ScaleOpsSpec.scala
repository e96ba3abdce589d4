package graft

import graft.operators.ScaleOps
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {

  test("q37 salted join equals the unsalted join (salting is transparent)") {
    val salted = ScaleOps.q37_salted_join.run(spark, sfDir)
    val links = Tables.links(spark, sfDir)
    val plain = links
      .groupBy(col("link_domain"))
      .agg(sum(col("qty") * length(col("link_domain"))).cast("bigint").as("weighted_qty"),
        count(lit(1)).as("n_links"))
    assert(salted.count() == plain.count())
    assert(salted.join(plain, Seq("link_domain", "weighted_qty", "n_links"), "left_anti").count() == 0)
  }

  test("q37 actually shuffles (the hint defeats auto-broadcast)") {
    val plan = ScaleOps.q37_salted_join.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      s"expected a shuffle join in:\n$plan")
  }

  test("q42 as-of join matches a naive (quadratic) range-join recompute") {
    val got = ScaleOps.q42_asof_join.run(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"),
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_matched"), r.getAs[Long]("total_gap_days")))).toMap
    // independent naive formulation: inequality join + max(order date)
    val ev = Tables.table(spark, sfDir, "events")
      .select(pmod(col("user_id"), lit(1500)).as("cust"), to_date(col("ts")).as("edate"),
        col("event_type"), col("event_id"))
    val ord = Tables.table(spark, sfDir, "orders")
      .select(col("o_custkey").as("ocust"), col("o_orderdate").cast("date").as("odate"))
    val naive = ev.join(ord, col("cust") === col("ocust") && col("edate") >= col("odate"), "left")
      .groupBy(col("event_id"), col("event_type"), col("edate"))
      .agg(max(col("odate")).as("last_order_d"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), count(col("last_order_d")).as("n_matched"),
        sum(datediff(col("edate"), col("last_order_d"))).cast("bigint").as("g"))
      .collect()
      .map(r => (r.getAs[String]("event_type"),
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_matched"), r.getAs[Long]("g")))).toMap
    assert(got == naive)
  }

  test("q38 sketch bound flags all pass and exacts are consistent") {
    // the bound checks now live INSIDE the query as oracle-gated
    // integer columns; the spec asserts they pass here too (and that
    // the exact columns are internally consistent), so a sketch
    // regression fails ScalaTest as well as the driver gate
    val rows = ScaleOps.q38_approx_stats.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("hll_ok") == 1, s"HLL out of bounds: $r")
      assert(r.getAs[Int]("p50_ok") == 1, s"p50 rank out of bounds: $r")
      assert(r.getAs[Int]("p95_ok") == 1, s"p95 rank out of bounds: $r")
      assert(r.getAs[Long]("exact_users") <= r.getAs[Long]("n_events"))
      assert(r.getAs[Double]("min_value") <= r.getAs[Double]("max_value"))
    }
  }
}
