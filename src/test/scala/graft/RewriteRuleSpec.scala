package graft

import graft.plans.{RewriteRankFilterToTopK, TopKStrategy}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RewriteRuleSpec extends SparkSpec {

  private def withRule[T](f: => T): T = {
    val exp = spark.experimental
    if (!exp.extraOptimizations.contains(RewriteRankFilterToTopK))
      exp.extraOptimizations = exp.extraOptimizations :+ RewriteRankFilterToTopK
    if (!exp.extraStrategies.contains(TopKStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKStrategy
    try f
    finally {
      exp.extraOptimizations = exp.extraOptimizations.filterNot(_ == RewriteRankFilterToTopK)
      exp.extraStrategies = exp.extraStrategies.filterNot(_ == TopKStrategy)
    }
  }

  private def orders = Tables.table(spark, sfDir, "orders")
    .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))

  private val w = Window.partitionBy(col("o_custkey"))
    .orderBy(col("o_totalprice").desc, col("o_orderkey"))

  private def topkQuery = orders.withColumn("rk", row_number().over(w))
    .filter(col("rk") <= 3).drop("rk")

  test("row_number<=k + drop(rank) rewrites to the TopKPerGroup operator") {
    // vanilla baseline first (rule not registered)
    val expect = topkQuery.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    withRule {
      val df = topkQuery
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerGroup"), s"rewrite did not fire:\n$plan")
      assert(!plan.contains("Window"),
        s"window machinery (incl. WindowGroupLimit) should be gone:\n$plan")
      val got = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
      assert(got == expect, "rewrite changed the result")
    }
  }

  test("rewrite leaves plans alone when the rank column is kept") {
    withRule {
      val df = orders.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("TopKPerGroup"), "must not fire when rank survives")
      assert(plan.contains("Window"))
    }
  }

  test("rewrite declines GLOBAL top-k (empty partition spec)") {
    withRule {
      val wGlobal = Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val df = orders.withColumn("rk", row_number().over(wGlobal))
        .filter(col("rk") <= 5).drop("rk")
      // must neither crash (ClusteredDistribution(Nil)) nor rewrite
      assert(!df.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
      assert(df.count() == 5)
    }
  }

  test("rewrite leaves rank()/dense_rank() alone (tie semantics differ)") {
    withRule {
      val df = orders.withColumn("rk", rank().over(w)).filter(col("rk") <= 3).drop("rk")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("TopKPerGroup"))
    }
  }
}
