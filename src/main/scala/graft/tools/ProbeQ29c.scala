package graft.tools

import org.apache.spark.sql.functions._

/** One-off: of q29's blocked candidate pairs, how many fail the
  * lossless size-ratio screen (5·min(sz) ≥ 4·max(sz))? Decides whether
  * carrying the shingle-set size in the fused key rows would prune the
  * SMJ emission / verify input meaningfully (q29's classes are
  * same-LENGTH, so distinct-shingle sizes may be too uniform to cut).
  */
object ProbeQ29c {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = graft.GraftConf.local(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.TextOps
    val docs = TextOps.probeShingled(spark, dir)
    val cand = TextOps.probeCand(docs).localCheckpoint()
    val sz = docs.select(col("doc_id"),
      size(graft.plans.ShingleHashes.of(col("text"))).cast("long").as("sz"))
    val j = cand
      .join(sz.select(col("doc_id").as("a_id"), col("sz").as("sa")), "a_id")
      .join(sz.select(col("doc_id").as("b_id"), col("sz").as("sb")), "b_id")
    val agg = j.agg(
      count(lit(1)).as("pairs"),
      sum(when(expr("5 * least(sa, sb) >= 4 * greatest(sa, sb)"), 1).otherwise(0)).as("pass"))
    agg.show(false)
    spark.stop()
  }
}
