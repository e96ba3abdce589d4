package graft.tools

import org.apache.spark.sql.functions._

/** Recall/cost curve for the two-level IVF index (dev tool): at a
  * given dir, fits the index, computes the exact quantized top-10 for
  * the 5 bench queries, then sweeps probe counts and reports recall@10
  * + wall per sweep point. This is the measurement behind the
  * `fineProbesFor` law — the scaladoc's numbers must trace here.
  *
  * {{{ tools/run_main.sh graft.tools.ProbeAnn /tmp/graft_sf100 }}}
  */
object ProbeAnn {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf100")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = graft.GraftConf.local(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sim = graft.operators.SimilarityOps
    val e = graft.Tables.embeddings(spark, dir)
    val n = e.count()
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe-ann] $what%-40s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    val idx = time("index fit (coarse + fine if engaged)")(sim.probeIvfFit(spark, dir))
    println(s"[probe-ann] n=$n coarse=${idx.n} fine=${idx.fine.map(_.total)} " +
      s"searchCells=${idx.searchCells} engaged=${sim.fineEngagedFor(n)} " +
      s"calibratedDen=${idx.fine.map(_.probeDen)} probes=${idx.fine.map(_.probes)} " +
      s"fitPress=${idx.fine.map(_.fitPress)}")
    // exact ground truth (once)
    val exactPairs = e.select(col("vec_id").as("n_id"))
      .join(broadcast(e.filter(col("vec_id") < 5).select(col("vec_id").as("q_id"))),
        col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"))
    val exact = time("exact top-10 (brute force)")(
      sim.probeTopK(e, exactPairs).select(col("q_id"), col("n_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    val total = idx.searchCells
    val sweep = Seq(total / 64, total / 32, total / 16, total / 8,
      total / 4, total / 2).filter(_ > 0).distinct
    sweep.foreach { m =>
      val cand = sim.probeIvfCandidates(spark, dir, m)
      val nCand = cand.count()
      val label = if (idx.fine.isEmpty) f"probes=prod-law (m=$m ignored, single-level)"
        else f"probes=$m%6d (${m.toDouble / total}%.4f of cells)"
      val got = time(label)(
        sim.probeTopK(e, cand.select(col("q_id"), col("n_id")))
          .select(col("q_id"), col("n_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      val hits = got.count(exact.contains)
      println(f"[probe-ann]   recall@10 = ${hits.toDouble / exact.size}%.4f " +
        f"($hits/${exact.size}) candidates=$nCand (${nCand / 5.0 / n}%.4f of corpus/query)")
    }
    // the production law, timed warm (2 reps), as q40 runs it
    (1 to 2).foreach { r =>
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries("q40_ivf_cosine")(spark, dir).count()
      println(f"[probe-ann] q40 production rep$r ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$rows")
    }
    (1 to 2).foreach { r =>
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries("q73_pq_ann")(spark, dir).count()
      println(f"[probe-ann] q73 production rep$r ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$rows")
    }
    spark.stop()
  }
}
