package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphOps

object Q82Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftConf.local(32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val all = GraphOps.edgesOf(Tables.links(spark, dir)).localCheckpoint(true)
      val isNew = conv(substring(md5(concat(col("src"), lit("|"), col("dst"))), 1, 8), 16, 10)
        .cast("bigint") % 20 === 0
      val prevE = all.filter(!isNew).localCheckpoint(true)
      println(s"[probe] $dir edges all=${all.count()} prev=${prevE.count()}")
      for (tol <- Seq(1e-4, 1e-6)) {
        val t0 = System.nanoTime()
        val (prev, itPrev) = GraphOps.pageRankOnEdges(prevE, maxIters = 60, tol = Some(tol))
        val prevMat = prev.localCheckpoint()
        val (_, itCold) = GraphOps.pageRankOnEdges(all, maxIters = 60, tol = Some(tol))
        val (_, itWarm) = GraphOps.pageRankOnEdges(all, maxIters = 60, tol = Some(tol), init = Some(prevMat))
        println(f"[probe] $dir tol=$tol prevIters=$itPrev cold=$itCold warm=$itWarm wall=${(System.nanoTime()-t0)/1e9}%.1fs")
      }
    }
    spark.stop()
  }
}
