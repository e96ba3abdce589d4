package graft.tools

import org.apache.spark.sql.functions._

/** Stage decomposition for the q83 ANN-recall gate (dev tool): the r17
  * verdict flagged a +1.9-2.9s regression at every SF coincident with
  * the cap-pressure gauge, while the in-code comment claimed "wall
  * unchanged". This probe attributes the cost by timing the gate's
  * components separately so the fix (and the corrected comment) rest on
  * numbers:
  *
  *   - full q83 run (warm, as Bench times it)
  *   - the hyperplane fold + bucket agg alone (no persist)
  *   - persist-materialize + pressure rollup (the r17 sequential prefix)
  *   - pairs from the persisted cache vs pairs recomputing the fold
  *
  * {{{ tools/run_main.sh graft.tools.ProbeQ83 /root/testdata/sf0.1 2 }}}
  */
object ProbeQ83 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = graft.GraftConf.local(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe-q83] $what%-34s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val q = graft.SparkEntry.queries("q83_ann_recall")
    (1 to reps).foreach { r =>
      time(s"full q83 gate (rep $r)")(q(spark, dir).count())
    }
    val sim = graft.operators.SimilarityOps
    (1 to reps).foreach { r =>
      val buckets = sim.probeLshBucketAgg(spark, dir)
      time(s"fold+bucketAgg, no persist (rep $r)")(
        buckets.select(count(lit(1))).collect())
      val persisted = sim.probeLshBucketAgg(spark, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time(s"persist-mat + pressure (rep $r)")(
        sim.probeLshPressure(persisted).collect())
      time(s"pairs from cache (rep $r)")(
        sim.probeLshPairs(persisted).select(count(lit(1))).collect())
      persisted.unpersist(true)
      time(s"pairs recompute fold (rep $r)")(
        sim.probeLshPairs(sim.probeLshBucketAgg(spark, dir))
          .select(count(lit(1))).collect())
    }
    spark.stop()
  }
}
