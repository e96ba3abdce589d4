package graft.tools

import org.apache.spark.sql.functions._

/** Jaccard distribution of q30's banded candidates (dev tool): how
  * much of the exact-verify bill is spent rejecting candidates, and
  * at what similarity — sizes the r16 conservative pre-verify screen.
  *
  * {{{ tools/run_main.sh graft.tools.ProbeQ30b /tmp/graft_sf1 }}}
  */
object ProbeQ30b {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = graft.GraftConf.local(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cand = graft.operators.SimilarityOps.minhashCandidatePairs(spark, dir)
      .localCheckpoint()
    println("candidates = " + cand.count())
    val docs = graft.Tables.docsWithNearDups(spark, dir)
      .select(col("doc_id"), col("text"))
    val sh = (c: org.apache.spark.sql.Column) => graft.plans.ShingleHashes.of(c)
    val scored = cand
      .join(docs.select(col("doc_id").as("a_id"), col("text").as("a_text")), "a_id")
      .join(docs.select(col("doc_id").as("b_id"), col("text").as("b_text")), "b_id")
      .select(
        graft.plans.SortedIntersectCount.of(sh(col("a_text")), sh(col("b_text")))
          .as("inter"),
        (size(sh(col("a_text"))) + size(sh(col("b_text")))).as("szsum"))
      .select((col("inter").cast("double") /
        (col("szsum") - col("inter")).cast("double")).as("j"))
    scored.groupBy(floor(col("j") * 20).as("bucket20"))
      .count().orderBy(col("bucket20"))
      .collect()
      .foreach(r => println(f"J in [${r.getLong(0) / 20.0}%.2f, ${(r.getLong(0) + 1) / 20.0}%.2f): ${r.getLong(1)}"))
    spark.stop()
  }
}
