package graft.tools

import org.apache.spark.scheduler._

/** r19 measurement harness (guide §1): run ONE registered query under a
  * SparkListener and report the job/stage/task/shuffle-byte bill — the
  * numbers that expose per-iteration waste in the iterative operators
  * (q51/q78/q79/q82/q36/q74), where the final `explain` only shows the
  * last checkpoint leaf and hides the loop's exchanges.
  *
  *   tools/run_main.sh graft.tools.ProbeIter q51_pagerank /root/testdata/sf0.1 3
  */
object ProbeIter {
  def main(a: Array[String]): Unit = {
    val name = a(0)
    val dir = if (a.length > 1) a(1) else "/root/testdata/sf0.1"
    val reps = if (a.length > 2) a(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftConf.local(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val shufW = new java.util.concurrent.atomic.AtomicLong
    val shufR = new java.util.concurrent.atomic.AtomicLong
    // r20 (guide §5, VERDICT item 5): spill is the signal the heavy LSH
    // rows need auditing for at 100× — report it per rep alongside the
    // shuffle bill so "zero-spill" is a recorded number, not a guess
    val spillMem = new java.util.concurrent.atomic.AtomicLong
    val spillDisk = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        val m = s.stageInfo.taskMetrics
        shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shufR.addAndGet(m.shuffleReadMetrics.remoteBytesRead +
          m.shuffleReadMetrics.localBytesRead)
        spillMem.addAndGet(m.memoryBytesSpilled)
        spillDisk.addAndGet(m.diskBytesSpilled)
      }
    }
    if (a.length > 3 && a(3) == "noaqe")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.range(1000).selectExpr("sum(id)").collect() // warm-up
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name"))
    spark.sparkContext.addSparkListener(listener)
    (1 to reps).foreach { r =>
      jobs.set(0); stages.set(0); tasks.set(0); shufW.set(0); shufR.set(0)
      spillMem.set(0); spillDisk.set(0)
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain
      println(f"[probeiter] $name rep$r $secs%.2fs rows=$n jobs=${jobs.get}" +
        f" stages=${stages.get} tasks=${tasks.get}" +
        f" shufWriteMB=${shufW.get / 1e6}%.1f shufReadMB=${shufR.get / 1e6}%.1f" +
        f" spillMemMB=${spillMem.get / 1e6}%.1f spillDiskMB=${spillDisk.get / 1e6}%.1f")
    }
    spark.stop()
  }
}
