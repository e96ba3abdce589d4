package graft.tools

/** Dev probe: q03 under sorted buckets, hash-agg vs sort-agg. */
object ProbeQ03b {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = graft.GraftConf.local(32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $what%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    time("bucketed build+warm q03")(graft.SparkEntry.queries("q03_topk")(spark, dir).count())
    time("q03 hashagg")(graft.SparkEntry.queries("q03_topk")(spark, dir).count())
    time("q03 hashagg 2")(graft.SparkEntry.queries("q03_topk")(spark, dir).count())
    spark.conf.set("spark.sql.execution.replaceHashWithSortAgg.enabled", "true")
    time("q03 sortagg")(graft.SparkEntry.queries("q03_topk")(spark, dir).count())
    time("q03 sortagg 2")(graft.SparkEntry.queries("q03_topk")(spark, dir).count())
    println(graft.SparkEntry.queries("q03_topk")(spark, dir).queryExecution.executedPlan.toString.linesIterator.take(12).mkString("\n"))
    spark.stop()
  }
}
