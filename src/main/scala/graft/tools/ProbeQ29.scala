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
    val docs = time("nearDupDocs frame")(TextOps.probeShingled(spark, dir))
    time("docs count")(println("  docs=" + docs.count()))
    val keyed = TextOps.probeKeyed(docs)
    time("keyed explode count")(println("  keyed=" + keyed.count()))
    val cand = TextOps.probeCand(docs)
    val q = time("cand self-join distinct")(cand.count())
    println("  cand=" + q)
    println("[q29] cand executed plan:")
    println(cand.queryExecution.executedPlan.toString.take(4500))
    val full = TextOps.blockedJaccardPairs(docs)
    time("full blocked pipeline")(println("  pairs=" + full.count()))
    // under AQE, exchange reuse surfaces as the SAME ShuffleQueryStage
    // id referenced from both SMJ sides, not as a ReusedExchange node
    // in the adaptive plan string — count duplicate stage ids too
    // (stage-metric ground truth: the keyed exchange's bytes are
    // written once and read 2×, see ProbeQ29b)
    val plan = full.queryExecution.executedPlan.toString
    val stageIds = """ShuffleQueryStage (\d+)""".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    println("[q29] keyed exchange reused: " +
      (plan.contains("ReusedExchange") || stageIds.distinct.size < stageIds.size))
    (1 to 2).foreach { r =>
      time(s"full rerun $r")(TextOps.blockedJaccardPairs(docs).count())
    }
    // verify-stage decomposition over a PRE-MATERIALIZED candidate
    // frame: how much of the pipeline is candidate gen vs the text
    // joins vs the per-pair shingle recompute
    val candM = cand.localCheckpoint()
    val ids = candM.select(col("a_id").as("doc_id"))
      .union(candM.select(col("b_id").as("doc_id"))).distinct()
    time("ids distinct")(println("  ids=" + ids.count()))
    val txt = docs.select(col("doc_id"), col("text"))
      .join(ids, Seq("doc_id"), "left_semi")
    time("txt semi-join")(println("  txt=" + txt.count()))
    val j1 = candM.join(
      txt.select(col("doc_id").as("a_id"), col("text").as("a_text")), "a_id")
    time("join1 (a_text)")(j1.count())
    val j2 = j1.join(
      txt.select(col("doc_id").as("b_id"), col("text").as("b_text")), "b_id")
    time("join2 (b_text)")(j2.count())
    val sh = (c: org.apache.spark.sql.Column) => graft.plans.ShingleHashes.of(c)
    time("recompute+intersect")(
      j2.select(
        graft.plans.SortedIntersectCount.of(sh(col("a_text")), sh(col("b_text")))
          .as("inter"),
        (size(sh(col("a_text"))) + size(sh(col("b_text")))).as("sz_sum"))
        .selectExpr("sum(inter)", "sum(sz_sum)").collect())
    spark.stop()
  }
}
