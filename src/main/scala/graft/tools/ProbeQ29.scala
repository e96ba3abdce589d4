package graft.tools

import org.apache.spark.sql.functions._

/** Cost decomposition for q29's blocked-Jaccard pipeline (dev tool):
  * times shingling, key explode, candidate self-join and the full
  * query separately, and prints whether the executed plan reused the
  * fat exchange (AQE stage reuse) — the property the r13 self-join
  * spelling depends on.
  *
  * {{{ tools/run_main.sh graft.tools.ProbeQ29 /tmp/graft_sf10 }}}
  */
object ProbeQ29 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = graft.GraftConf.local(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q29] $what%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    import graft.operators.TextOps
    val docs = time("shingledDocs checkpoint")(TextOps.probeShingled(spark, dir))
    time("docs count")(println("  docs=" + docs.count()))
    val keyed = TextOps.probeKeyed(docs)
    time("keyed explode count")(println("  keyed=" + keyed.count()))
    val cand = TextOps.probeCand(docs)
    val q = time("cand self-join distinct")(cand.count())
    println("  cand=" + q)
    val full = TextOps.blockedJaccardPairs(docs)
    time("full blocked pipeline")(println("  pairs=" + full.count()))
    val plan = full.queryExecution.executedPlan.toString
    println("[q29] executed plan has ReusedExchange/StageReuse: " +
      (plan.contains("ReusedExchange") || plan.contains("reused")))
    (1 to 2).foreach { r =>
      time(s"full rerun $r")(TextOps.blockedJaccardPairs(docs).count())
    }
    spark.stop()
  }
}
