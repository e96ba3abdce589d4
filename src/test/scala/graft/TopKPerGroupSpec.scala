package graft

import graft.plans.TopKPerGroup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerGroupSpec extends SparkSpec {

  private def orders = Tables.table(spark, sfDir, "orders")
    .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))

  test("custom operator equals the window row_number formulation") {
    val viaCustom = TopKPerGroup(orders,
      Seq(col("o_custkey")), Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val viaWindow = orders.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3).drop("rk")
    assert(viaCustom.count() == viaWindow.count())
    assert(viaCustom.exceptAll(viaWindow).count() == 0)
    assert(viaWindow.exceptAll(viaCustom).count() == 0)
  }

  test("plans as partial + exchange + final (aggregate-style split)") {
    val plan = TopKPerGroup(orders,
      Seq(col("o_custkey")), Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      .queryExecution.executedPlan.toString
    assert("TopKPerGroup \\[".r.findAllIn(plan).size == 2,
      s"expected partial+final TopKPerGroup nodes in:\n$plan")
    assert(plan.contains("Exchange"), "expected a group-key exchange between stages")
  }

  test("k=1 returns exactly one row per group, the maximum") {
    val top1 = TopKPerGroup(orders,
      Seq(col("o_custkey")), Seq(col("o_totalprice").desc, col("o_orderkey").asc), 1)
    val expect = orders.groupBy("o_custkey")
      .agg(max(col("o_totalprice")).as("best"))
    val joined = top1.join(expect, "o_custkey")
    assert(top1.groupBy("o_custkey").count().filter(col("count") =!= 1).count() == 0)
    assert(joined.filter(col("o_totalprice") =!= col("best")).count() == 0)
  }

  test("partial bypass at high group cardinality stays exact") {
    // one fat partition whose first 131072+ keys are all distinct: the
    // partial stage's probe must flip to pass-through, and the final
    // stage must still be exact — keys repeat only AFTER the probe point
    val df = spark.range(400000).select(
      (col("id") % 200000).as("g"),
      (col("id") * 37 % 1001).as("v"),
      col("id"))
      .repartition(1)
    val viaCustom = TopKPerGroup(df,
      Seq(col("g")), Seq(col("v").desc, col("id").asc), 2)
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id").asc)
    val viaWindow = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2).drop("rk")
    assert(viaCustom.count() == viaWindow.count())
    assert(viaCustom.exceptAll(viaWindow).count() == 0)
    assert(viaWindow.exceptAll(viaCustom).count() == 0)
  }

  test("groups smaller than k pass through whole") {
    val k100 = TopKPerGroup(orders,
      Seq(col("o_custkey")), Seq(col("o_orderkey").asc), 100000)
    assert(k100.count() == orders.count())
  }
}
