package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: decompose q03 cost (lineitem agg vs topk vs join). */
object ProbeQ03 {
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
    val li = graft.Tables.table(spark, dir, "lineitem")
    time("warm q03")(graft.SparkEntry.queries("q03_topk")(spark, dir).count())
    time("li scan 3col")(li.agg(sum(col("l_orderkey"))).count())
    val rev = li.groupBy(col("l_orderkey"))
      .agg(sum(expr("cast(l_extendedprice * (1 - l_discount) as decimal(25,10))")).as("rev_d"))
    time("rev agg (decimal)")(rev.count())
    val revD = li.groupBy(col("l_orderkey"))
      .agg(sum(expr("l_extendedprice * (1 - l_discount)")).as("rev_d"))
    time("rev agg (double)")(revD.count())
    val top = rev.select(col("l_orderkey"), round(col("rev_d").cast("double"), 6).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
    time("topk")(top.count())
    time("q03 full")(graft.SparkEntry.queries("q03_topk")(spark, dir).count())
    spark.stop()
  }
}
