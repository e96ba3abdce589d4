package graft.tools

import org.apache.spark.sql.functions._

/** Stage decomposition of q53_decontaminate (dev tool; r17 verdict
  * item 6): q53 reads 29-66s across sf100 draws — linear by design,
  * but the second-slowest stable row. This splits the bill into
  *   (1) the train-side GramHashes scan+explode (the O(corpus-chars)
  *       floor nothing can trim without changing the operator),
  *   (2) the broadcast eval-gram hash probe on top of (1),
  *   (3) the full query (adds the per-doc countDistinct tail over
  *       eval-MATCHING grams only),
  * so the floor is certified — or a trimmable term is exposed (the
  * q81-style row-local distinct before the probe).
  *
  * {{{ tools/run_main.sh graft.tools.ProbeQ53 /tmp/graft_sf100 2 }}}
  */
object ProbeQ53 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf100")
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = graft.GraftConf.local(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe-q53] $what%-36s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = graft.Tables.table(spark, dir, "documents")
    val train = docs.filter(col("doc_id") % 50 =!= 7)
    val eval_ = docs.filter(col("doc_id") % 50 === 7)
    def grams(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), explode(graft.plans.GramHashes.of(col("text"), 8)).as("g"))
    (1 to reps).foreach { r =>
      val n1 = time(s"1 train gram scan+explode (rep $r)")(
        grams(train).select(count(lit(1))).collect().head.getLong(0))
      val ne = time(s"  eval gram scan (rep $r)")(
        grams(eval_).select(count(lit(1))).collect().head.getLong(0))
      val n2 = time(s"2 scan + broadcast probe (rep $r)")(
        grams(train).join(broadcast(grams(eval_).select(col("doc_id").as("eval_id"), col("g"))), "g")
          .select(count(lit(1))).collect().head.getLong(0))
      val n3 = time(s"3 full q53 (rep $r)")(
        graft.SparkEntry.queries("q53_decontaminate")(spark, dir).count())
      // candidate respelling: two single-distinct subplans — no Expand
      // (the multi-distinct plan doubles the 10B-row joined stream),
      // and the per-doc shared-gram count joins the DISTINCT eval
      // vocabulary so it needs a plain count, not a distinct at all
      val evalG = grams(eval_).select(col("doc_id").as("eval_id"), col("g"))
      val n4 = time(s"4 respelled q53 (rep $r)")({
        val sharedGrams = grams(train)
          .join(broadcast(evalG.select(col("g")).distinct()), "g")
          .groupBy(col("doc_id"))
          .agg(count(col("g")).cast("bigint").as("n_shared_grams"))
        val evalDocs = grams(train)
          .join(broadcast(evalG), "g")
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("eval_id")).cast("bigint").as("n_eval_docs"))
        evalDocs.join(sharedGrams, "doc_id").count()
      })
      println(s"[probe-q53]   train_grams=$n1 eval_grams=$ne matched=$n2 out_docs=$n3 respelled=$n4")
    }
    spark.stop()
  }
}
