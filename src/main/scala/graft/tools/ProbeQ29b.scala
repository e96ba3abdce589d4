package graft.tools

import org.apache.spark.scheduler._

/** One-off probe: per-stage wall/CPU/shuffle/spill metrics for q29's
  * candidate self-join, to attribute the ~16s of post-keying machinery
  * at sf10 (sorts vs SMJ emission vs aggregate vs shuffle I/O).
  *
  * {{{ sbt "runMain graft.tools.ProbeQ29b /tmp/graft_sf10" }}}
  */
object ProbeQ29b {
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
          f"run=${m.executorRunTime / 1e3}%7.1fs " +
          f"gc=${m.jvmGCTime / 1e3}%5.1fs " +
          f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB " +
          f"spillM=${m.memoryBytesSpilled / 1e6}%8.1fMB spillD=${m.diskBytesSpilled / 1e6}%8.1fMB " +
          f"| ${si.name.take(60)}")
      }
    })
    import graft.operators.TextOps
    val docs = TextOps.probeShingled(spark, dir)
    val cand = TextOps.probeCand(docs)
    val t0 = System.nanoTime()
    println("cand=" + cand.collect().length + f" in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(_._1).foreach { case (_, s) => println(s) }
    spark.stop()
  }
}
