package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: decompose q17 compaction cost (scan+join vs full agg). */
object ProbeQ17 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = graft.GraftConf.local(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $what%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val links = graft.Tables.links(spark, dir)
    time("warm compact")(graft.operators.LinkCompaction.compact(links).count())
    time("links count (pruned)")(links.count())
    time("links full-width agg")(
      links.agg(sum(length(col("page_path")) + length(col("ip")) + length(col("link_text"))
        + length(col("link_domain")) + length(col("page_host")) + length(col("date_from"))
        + length(col("link_subdomain")) + length(col("link_path")) + length(col("link_rawquery"))
        + length(col("page_rawquery"))).as("s")).count())
    time("groupBy keys only count")(
      links.groupBy(col("link_domain"), col("link_subdomain"), col("link_path"),
        col("link_rawquery"), col("page_host")).agg(sum(col("qty"))).count())
    time("compact full")(graft.operators.LinkCompaction.compact(links).count())
    time("compact full 2")(graft.operators.LinkCompaction.compact(links).count())
    spark.stop()
  }
}
