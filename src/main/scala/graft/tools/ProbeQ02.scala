package graft.tools

import org.apache.spark.sql.functions._

/** q02 residual triage (r17 verdict item 1): the plan is right (both
  * bucketed scans engage, zero exchange below the per-orderkey partial
  * aggregate) but steady wall is ~3.6s at sf10 vs DuckDB's 1.54s flat
  * plan. Decompose the 3.6s into (a) the bucketed-scan floor, (b) the
  * 15M-group per-orderkey aggregate, (c) the orders join + per-cust
  * aggregate, (d) the dim tail — and A/B the sorted-bucket SortAggregate
  * against the default hash aggregate (the buckets are sorted by
  * l_orderkey, so a streaming aggregate needs no hash map at all).
  *
  *   SPARK_DRIVER_MEM=32g tools/run_main.sh graft.tools.ProbeQ02 /tmp/graft_sf10
  */
object ProbeQ02 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = graft.GraftConf.local(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](what: String, reps: Int = 3)(f: => A): Unit =
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        f
        println(f"[probe] $what%-34s rep$r ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      }
    spark.range(1000).selectExpr("sum(id)").collect()

    val li = graft.BucketedTables.lineitem(spark, dir)
    val o = graft.BucketedTables.orders(spark, dir)
    // warm the page cache so every timed stage reads memory
    li.agg(count(lit(1))).collect(); o.agg(count(lit(1))).collect()

    time("scan floor: sum(rev_part)") {
      li.agg(sum(col("rev_part")), count(lit(1))).collect()
    }
    def perOrder = li.groupBy(col("l_orderkey")).agg(
      sum(col("rev_part")).as("rev_d"), count(lit(1)).as("n_i"))
    time("perOrder agg (hash)") { perOrder.agg(count(lit(1))).collect() }
    spark.conf.set("spark.sql.execution.replaceHashWithSortAgg", "true")
    time("perOrder agg (sortAgg)") { perOrder.agg(count(lit(1))).collect() }
    println("[probe] perOrder plan under sortAgg conf:")
    println(perOrder.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Aggregate") || l.contains("Scan") || l.contains("Exchange"))
      .mkString("\n"))
    spark.conf.set("spark.sql.execution.replaceHashWithSortAgg", "false")

    def perCust = perOrder
      .join(o, col("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("rev_d")).as("rev_d"), sum(col("n_i")).as("n_i"))
    time("..+orders join+perCust agg") { perCust.agg(count(lit(1))).collect() }

    time("full q02 (hash)") {
      graft.SparkEntry.queries("q02_join_dims")(spark, dir).count()
    }
    spark.conf.set("spark.sql.execution.replaceHashWithSortAgg", "true")
    time("full q02 (sortAgg)") {
      graft.SparkEntry.queries("q02_join_dims")(spark, dir).count()
    }
    spark.conf.set("spark.sql.execution.replaceHashWithSortAgg", "false")

    // candidate respelling: broadcast the two-int customer projection
    // so the per-cust exchange disappears — the aggregate goes straight
    // to 25 nation groups map-side
    val c = graft.Tables.table(spark, dir, "customer")
    val n = graft.Tables.table(spark, dir, "nation")
    val r = graft.Tables.table(spark, dir, "region")
    def q02b = {
      val perNation = perOrder
        .join(o.select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c.select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(sum(col("rev_d")).as("rev_d"), sum(col("n_i")).as("n_i"))
      perNation
        .join(broadcast(n), col("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("rev_d")).cast("double"), 6).as("revenue"),
          sum(col("n_i")).as("n_items"))
    }
    time("q02b bcast-cust (hash)") { q02b.count() }
    spark.conf.set("spark.sql.execution.replaceHashWithSortAgg", "true")
    time("q02b bcast-cust (sortAgg)") { q02b.count() }
    spark.conf.set("spark.sql.execution.replaceHashWithSortAgg", "false")
    // and the no-perOrder variant: join 60M lineitem rows straight
    // through (trades the 15M-group aggregate for 4x join traffic)
    def q02c = {
      val perNation = li.select(col("l_orderkey"), col("rev_part"))
        .join(o.select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c.select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(sum(col("rev_part")).as("rev_d"), count(lit(1)).as("n_i"))
      perNation
        .join(broadcast(n), col("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("rev_d")).cast("double"), 6).as("revenue"),
          sum(col("n_i")).as("n_items"))
    }
    time("q02c no-perOrder bcast") { q02c.count() }

    // registered-query A/B at the session default (sortAgg on) vs off
    val q = graft.SparkEntry.queries("q02_join_dims")
    time("q02 registered sortAgg=on", 4) { q(spark, dir).count() }
    spark.conf.set("spark.sql.execution.replaceHashWithSortAgg", "false")
    time("q02 registered sortAgg=off", 4) { q(spark, dir).count() }
    spark.conf.set("spark.sql.execution.replaceHashWithSortAgg", "true")
    val q41 = graft.SparkEntry.queries("q41_domain_sketch")
    time("q41 registered sortAgg=on", 4) { q41(spark, dir).count() }
    spark.conf.set("spark.sql.execution.replaceHashWithSortAgg", "false")
    time("q41 registered sortAgg=off", 4) { q41(spark, dir).count() }
    spark.stop()
  }
}

/** A/B of the r17 replaceHashWithSortAgg default on the dedup family
  * (their corpus aggregates read doc_id-sorted buckets, so the rule
  * fires there): regression guard for the global conf flip.
  */
object ProbeSortAgg {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = graft.GraftConf.local(32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(what: String, reps: Int)(f: => Any): Unit =
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        f
        println(f"[probe] $what%-30s rep$r ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      }
    spark.range(1000).selectExpr("sum(id)").collect()
    for (q <- Seq("q30_minhash_lsh", "q36_dup_clusters", "q29_ngram_jaccard")) {
      val fn = graft.SparkEntry.queries(q)
      time(s"$q sortAgg=on", 3) { fn(spark, dir).count() }
      spark.conf.set("spark.sql.execution.replaceHashWithSortAgg", "false")
      time(s"$q sortAgg=off", 3) { fn(spark, dir).count() }
      spark.conf.set("spark.sql.execution.replaceHashWithSortAgg", "true")
    }
    spark.stop()
  }
}
