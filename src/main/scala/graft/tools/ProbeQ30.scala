package graft.tools

import org.apache.spark.scheduler._

/** One-off probe: q30's candidate count and candidate-vs-verify wall
  * split at a given SF, with per-stage metrics (the r14 text-shipping
  * verify respelling moved q30 11.6→25s at sf10 — attribute it).
  *
  * {{{ sbt "runMain graft.tools.ProbeQ30 /tmp/graft_sf10" }}}
  */
object ProbeQ30 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = graft.GraftConf.local(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        stages.put(si.stageId, f"stage ${si.stageId}%3d tasks=${si.numTasks}%4d " +
          f"wall=${wall}%6.2fs cpu=${m.executorCpuTime / 1e9}%7.1fs " +
          f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB " +
          f"spillD=${m.diskBytesSpilled / 1e6}%8.1fMB")
      }
    })
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q30] $what%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    import graft.operators.SimilarityOps
    val cand = SimilarityOps.minhashCandidatePairs(spark, dir)
    time("candidates")(println("  cand=" + cand.count()))
    val full = SimilarityOps.q30_minhash_lsh.run(spark, dir)
    time("full q30 (cand+verify)")(println("  pairs=" + full.count()))
    time("full q30 rerun")(full.count())
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(_._1).foreach { case (_, s) => println(s) }
    spark.stop()
  }
}
