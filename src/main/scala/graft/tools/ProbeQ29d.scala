package graft.tools

/** Stage decomposition for q29's r16 prefix-only spelling (dev tool):
  * times the screened candidate self-join and the exact-verify stage
  * separately, with rep counts, so a bench move can be attributed.
  *
  * History note (r16): this probe's A/B showed the r15 dual-layer
  * (prefix ∧ pigeonhole) intersection produced a candidate set
  * bit-identical to `screened prefix ∧ arrays_overlap(bucket hashes)`
  * (2,011,521 = 2,011,521 at sf10) while the prefix-only screened set
  * was 2,595,058 — only ~23% larger — and the prefix-only FULL
  * pipeline ran 9.4s vs 14.5s (r15 spelling) steady-state at sf10.
  * That measurement retired the pigeonhole layer.
  *
  * {{{ tools/run_main.sh graft.tools.ProbeQ29d /tmp/graft_sf10 }}}
  */
object ProbeQ29d {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = graft.GraftConf.local(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q29d] $what%-30s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = graft.operators.TextOps.probeShingled(spark, dir)
    (1 to reps).foreach { r =>
      val cand = graft.operators.TextOps.probeCand(docs)
      time(s"screened candidates rep$r")(println("  cand=" + cand.count()))
      time(s"full q29 rep$r")(println("  pairs=" +
        graft.operators.TextOps.blockedJaccardPairs(docs).count()))
    }
    spark.stop()
  }
}
