package graft.tools

import org.apache.spark.sql.functions._

/** One-off: full vs sampled common-token fit cost at a dir (dev). */
object ProbeFit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf100")
    val spark = graft.GraftConf.local(32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.BucketedTables.docsNearDups(spark, dir)
    def fitOf(d: org.apache.spark.sql.DataFrame) =
      d.select(explode(graft.plans.ShingleHashes.of(col("text"))).as("t"))
        .groupBy(col("t")).count()
        .orderBy(col("count").desc, col("t"))
        .limit(4096).collect().map(_.getLong(0))
    val t0 = System.nanoTime()
    val full = fitOf(docs)
    println(f"[fit] full: ${(System.nanoTime() - t0) / 1e9}%.1fs")
    val t1 = System.nanoTime()
    val samp = fitOf(docs.sample(0.05, 42))
    println(f"[fit] 5%% sample: ${(System.nanoTime() - t1) / 1e9}%.1fs " +
      s"overlap=${full.toSet.intersect(samp.toSet).size}/4096")
    spark.stop()
  }
}
