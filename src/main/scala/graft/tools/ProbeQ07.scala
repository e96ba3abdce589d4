package graft.tools

import org.apache.spark.sql.functions._

/** Cost decomposition for q07's windowed rank at big SFs (dev tool):
  * times the raw orders scan, a scan+exchange, and the full query, and
  * prints the executed plan — separating scan cost, shuffle cost and
  * the two WindowGroupLimit sorts so an sf100 regression is
  * attributable to a stage instead of guessed at.
  *
  * {{{ tools/run_main.sh graft.tools.ProbeQ07 /tmp/graft_sf100 }}}
  */
object ProbeQ07 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf100")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = graft.GraftConf.local(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q07] $what%-32s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val o = graft.Tables.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    time("orders scan count")(println("  rows=" + o.count()))
    time("orders scan count (warm)")(o.count())
    time("scan+exchange (repartition)")(
      o.repartition(col("o_custkey")).write.format("noop").mode("overwrite").save())
    time("scan+sort within partitions")(
      o.sortWithinPartitions(col("o_custkey"), col("o_totalprice").desc)
        .write.format("noop").mode("overwrite").save())
    val full = graft.SparkEntry.queries("q07_window_rank")
    time("full q07 (1)")(println("  out=" + full(spark, dir).count()))
    val q = full(spark, dir)
    time("full q07 (2)")(println("  out=" + q.count()))
    println(q.queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
