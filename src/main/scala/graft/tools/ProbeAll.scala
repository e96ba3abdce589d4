package graft.tools

import org.apache.spark.scheduler._

/** r19: one warm pass over EVERY registered query with the ProbeIter
  * listener — a census of per-query job/stage/task/shuffle bills, to
  * rank queries by orchestration weight rather than wall alone.
  *
  *   tools/run_main.sh graft.tools.ProbeAll /root/testdata/sf0.1
  */
object ProbeAll {
  def main(a: Array[String]): Unit = {
    val dir = if (a.length > 0) a(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftConf.local(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val shuf = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        tasks.addAndGet(s.stageInfo.numTasks)
        shuf.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })
    spark.range(1000).selectExpr("sum(id)").collect()
    val named = graft.SparkEntry.queries.toSeq.sortBy(_._1)
    // NonFatal only (r20, ADVICE): an OOM/interrupt must abort the
    // census, and a query that merely failed should say WHY next to its
    // -1 marker instead of masking the exception entirely
    import scala.util.control.NonFatal
    // warm pass first so the census pass sees steady-state costs
    named.foreach { case (name, fn) =>
      try { fn(spark, dir).count(); () } catch {
        case NonFatal(e) =>
          println(s"[probeall] $name warm-pass failed: ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    named.foreach { case (name, fn) =>
      jobs.set(0); tasks.set(0); shuf.set(0)
      val t0 = System.nanoTime()
      val ok = try { fn(spark, dir).count(); true }
      catch {
        case NonFatal(e) =>
          println(s"[probeall] $name failed: ${e.getClass.getName}: ${e.getMessage}")
          false
      }
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(120)
      println(f"[probeall] $name%-24s ${if (ok) secs else -1.0}%7.2fs" +
        f" jobs=${jobs.get}%3d tasks=${tasks.get}%5d shufMB=${shuf.get / 1e6}%8.1f")
    }
    spark.stop()
  }
}
