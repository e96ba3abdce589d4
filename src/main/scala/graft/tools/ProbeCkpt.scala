package graft.tools

import org.apache.spark.sql.functions._

/** r19: does `repartition(col).localCheckpoint()` preserve its hash
  * partitioning into the LogicalRDD leaf under AQE — i.e. do the
  * iterative loops' in-loop joins actually reuse the pinned edge
  * partitioning (the r17/r18 design assumption), or does every
  * iteration re-exchange the pinned side?
  */
object ProbeCkpt {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftConf.local(8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val e = (1 to 1000).map(i => (s"s${i % 50}", s"d${i % 97}"))
      .toDF("src", "dst").repartition(col("src")).localCheckpoint(false)
    val r = (1 to 50).map(i => (s"s$i", 1.0)).toDF("host", "rank")
    println("=== pinned-edges leaf partitioning ===")
    println(e.queryExecution.optimizedPlan.treeString.take(500))
    println("=== in-loop join plan (ranks x pinned edges on src) ===")
    r.join(e, r("host") === e("src")).groupBy(col("dst"))
      .agg(sum(col("rank"))).explain("formatted")
    spark.stop()
  }
}
