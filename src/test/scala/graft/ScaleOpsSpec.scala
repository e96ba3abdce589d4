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

  test("q38 sketch estimates stay within tolerance of exact values") {
    val rows = ScaleOps.q38_approx_stats.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"HLL off by >5%: approx=$approx exact=$exact")
      assert(r.getAs[Double]("p50_value") >= r.getAs[Double]("min_value"))
      assert(r.getAs[Double]("p95_value") <= r.getAs[Double]("max_value"))
      assert(r.getAs[Double]("p50_value") <= r.getAs[Double]("p95_value"))
    }
  }
}
