package graft.tools

/** q30 stage split (dev tool): candidate generation (MinHash
  * signatures → banding → sketch screen) vs the exact-verify tail —
  * the r18 roadmap asks where the sf100 47-136s actually goes before
  * touching the verify join's layout.
  *
  * {{{ SPARK_DRIVER_MEM=48g tools/run_main.sh graft.tools.ProbeQ30c /tmp/graft_sf100 }}}
  */
object ProbeQ30c {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = graft.GraftConf.local(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[probe-q30c] $tag%-12s ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    for (r <- 1 to reps) {
      println(s"[probe-q30c] rep $r")
      // candidate generation only: signatures + banding + sketch screen
      timed("candidates") {
        graft.operators.SimilarityOps.minhashCandidatePairs(spark, dir).count()
      }
      // the whole query: the delta over the line above is the
      // exact-verify tail (text joins + shingle Jaccard)
      timed("full_q30") {
        graft.operators.SimilarityOps.q30_minhash_lsh.run(spark, dir).count()
      }
    }
    spark.stop()
  }
}
