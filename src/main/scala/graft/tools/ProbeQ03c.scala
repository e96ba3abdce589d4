package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: is the double->decimal cast the q03 bottleneck? */
object ProbeQ03c {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = graft.GraftConf.local(32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $what%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val li = graft.BucketedTables.lineitem(spark, dir)
    time("warm")(li.groupBy(col("l_orderkey"))
      .agg(sum(expr("cast(l_extendedprice * (1 - l_discount) as decimal(25,10))")).as("r"))
      .agg(sum(col("r").cast("double"))).collect())
    time("agg cast25")(li.groupBy(col("l_orderkey"))
      .agg(sum(expr("cast(l_extendedprice * (1 - l_discount) as decimal(25,10))")).as("r"))
      .agg(sum(col("r").cast("double"))).collect())
    time("agg cast18")(li.groupBy(col("l_orderkey"))
      .agg(sum(expr("cast(l_extendedprice * (1 - l_discount) as decimal(18,10))")).as("r"))
      .agg(sum(col("r").cast("double"))).collect())
    time("agg double")(li.groupBy(col("l_orderkey"))
      .agg(sum(expr("l_extendedprice * (1 - l_discount)")).as("r"))
      .agg(sum(col("r"))).collect())
    // stored-decimal variant: one-time materialization cost vs per-query
    val stored = "/tmp/probe_lid"
    li.select(col("l_orderkey"),
      expr("cast(l_extendedprice * (1 - l_discount) as decimal(18,10))").as("rev_part"))
      .write.mode("overwrite").parquet(stored)
    val sd = spark.read.parquet(stored)
    time("agg stored-dec18")(sd.groupBy(col("l_orderkey"))
      .agg(sum(col("rev_part")).as("r"))
      .agg(sum(col("r").cast("double"))).collect())
    time("agg stored-dec18 2")(sd.groupBy(col("l_orderkey"))
      .agg(sum(col("rev_part")).as("r"))
      .agg(sum(col("r").cast("double"))).collect())
    spark.stop()
  }
}
