package graft.tools

import org.apache.spark.sql.functions._

/** Delta-ingest rehearsal at scale (dev tool): the recurring
  * production job for similarity at 100 TB — per segment import,
  * ASSIGN the new vectors to the existing index and run the drift
  * gauge; refit only when the gauge trips. Splits the dir's corpus
  * ~95/5, fits on the base, then gauges (a) the real spread delta and
  * (b) an adversarial concentrated delta.
  *
  * {{{ tools/run_main.sh graft.tools.ProbeDelta /tmp/graft_clustered }}}
  */
object ProbeDelta {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_clustered")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = graft.GraftConf.local(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sim = graft.operators.SimilarityOps
    val e = graft.Tables.embeddings(spark, dir)
    val base = e.filter(col("vec_id") % 21 =!= 0)
    val delta = e.filter(col("vec_id") % 21 === 0)
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe-delta] $what%-40s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    val nBase = base.count()
    println(s"[probe-delta] base=$nBase fineEngaged=${sim.fineEngagedFor(nBase)}")
    val idx = time("base fit (coarse+fine+calibration)") {
      val coarse = sim.fitIvfK(sim.embSample(base), sim.ivfCellsFor(nBase))
      val fine = sim.fitFineLevelFrame(spark, base, coarse)
      val den = sim.probeCalibrate(spark, base, coarse.copy(fine = Some(fine)))
      coarse.copy(fine = Some(fine.copy(probeDen = den)))
    }
    println(s"[probe-delta] fine=${idx.fine.map(_.total)} den=${idx.fine.map(_.probeDen)} " +
      s"fitPress=${idx.fine.map(_.fitPress)}")
    val spread = time("gauge: spread +5% delta (assign only)")(
      sim.deltaDriftGauge(spark, idx, base, delta).collect().head)
    println(s"[probe-delta] spread  -> $spread")
    val dim = graft.Tables.EmbeddingDim
    val hot = spark.range(nBase / 20).select(
      (col("id") + 1000000000L).as("vec_id"),
      expr(s"transform(sequence(0, ${dim - 1}), j -> cast(" +
        "sin(j * 3.77d) + 0.001d * (sin((id * 7919 + j) * 78.233d) * 12543.21d % 1.0d)" +
        " as float))").as("embedding"),
      lit("hot").as("label"))
    val conc = time("gauge: concentrated +5% delta")(
      sim.deltaDriftGauge(spark, idx, base, hot).collect().head)
    println(s"[probe-delta] hot     -> $conc")
    spark.stop()
  }
}
