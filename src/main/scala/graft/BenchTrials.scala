package graft

/** Variance probe for perf-watch queries: run each named query N times
  * in one long-lived session at the bench SF and print per-query
  * min/median/max plus the raw trials — the follow-up loop for
  * cross-round timing oscillations (best-of-two in `Bench` cannot
  * separate plan regressions from sandbox noise; five-plus trials with
  * a recorded spread can).
  *
  * {{{
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.BenchTrials q51_pagerank,q31_simhash 5"
  * }}}
  */
object BenchTrials {
  def main(args: Array[String]): Unit = {
    val names =
      if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("q51_pagerank", "q36_dup_clusters", "q31_simhash", "q32_cosine_topk")
    val trials = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = GraftConf.local(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect() // JVM warm-up
    val out = names.map { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to trials).map { t =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val s = math.rint((System.nanoTime() - t0) / 1e6) / 1e3
        // progress to stderr as each trial lands: a multi-hour big-SF
        // run that dies mid-flight (e.g. disk-full shuffle) must show
        // WHICH query was in flight and what already finished
        System.err.println(s"[trials] $name trial$t/${trials}: ${s}s")
        s
      }.sorted
      // True median: average the two middle elements for even N
      // (previously reported the upper-middle element for even N).
      val med =
        if (times.length % 2 == 1) times(times.length / 2)
        else math.rint((times(times.length / 2 - 1) + times(times.length / 2)) / 2 * 1e3) / 1e3
      s""""$name":{"trials":[${times.mkString(",")}],"min":${times.head},"med":$med,"max":${times.last}}"""
    }
    // per-query objects nest under "queries" — the previous framing
    // closed the outer object after the last query, leaving the sf/
    // trials fields dangling outside (TRIALS_r9.json is malformed JSON)
    println(out.mkString("""{"queries":{""", ",",
      s"""},"sf":"$sfDir","trials_per_query":$trials}"""))
    spark.stop()
  }
}
