package graft.tools

import org.apache.spark.sql.functions._

/** r20 evidence probe: the per-iteration contribs join's physical shape
  * over (a) the bucketed host_edges layout vs (b) a localCheckpoint pin,
  * with auto-broadcast DISABLED so the plan shows the non-broadcast
  * (cluster-scale) strategy. The claim under test: the bucketed scan
  * side carries hashpartitioning(src, 32) and sorted order, so the join
  * needs NO Exchange and NO Sort on the edge side, while the checkpoint
  * leaf reports UnknownPartitioning and pays both, every iteration.
  *
  *   tools/run_main.sh graft.tools.ProbeEdgeJoin /root/testdata/sf0.1
  */
object ProbeEdgeJoin {
  def main(a: Array[String]): Unit = {
    val dir = if (a.length > 0) a(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftConf.local(32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val eB = graft.BucketedTables.hostEdgesBySrc(spark, dir)
    val eC = eB.localCheckpoint(false)
    val ranks = eB.select(col("src").as("host")).distinct()
      .withColumn("share", lit(1.0))
      .localCheckpoint(false)
    def contribs(e: org.apache.spark.sql.DataFrame) =
      ranks.join(e, col("host") === e("src")).groupBy(col("dst"))
        .agg(sum(col("share")).as("in_share"))
    println("=== contribs over BUCKETED edge scan (broadcast off) ===")
    contribs(eB).explain("formatted")
    println("=== contribs over localCheckpoint pin (broadcast off) ===")
    contribs(eC).explain("formatted")
    spark.stop()
  }
}
