package graft.tools

import org.apache.spark.sql.functions._

/** q41 residual triage (r17 verdict item 1): ~2.0-2.4s at sf10 vs
  * DuckDB's 0.786s. Decompose: (a) the links-derivation scan floor,
  * (b) the per-domain MinHashAgg, (c) a distinct-first variant — the
  * fixture has 5 distinct link_texts over 15M rows, and min() over
  * duplicate elements is idempotent, so aggregating the DISTINCT
  * (domain, text) pairs is semantically identical (it is exactly what
  * the DuckDB oracle does) while hashing 275 elements instead of 15M.
  *
  *   SPARK_DRIVER_MEM=32g tools/run_main.sh graft.tools.ProbeQ41 /tmp/graft_sf10
  */
object ProbeQ41 {
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

    val links = graft.Tables.links(spark, dir)
    val dt = links.select(col("link_domain"), col("link_text"))
    dt.agg(count(lit(1))).collect() // warm page cache

    // what does the pruned scan read?
    println("[probe] pruned scan schema lines:")
    dt.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("ReadSchema") || l.contains("PushedFilters"))
      .foreach(l => println("[probe]   " + l.trim.take(160)))

    time("scan floor (domain,text) count") { dt.agg(count(lit(1))).collect() }
    time("distinct(domain,text)") { dt.distinct().count() }
    time("per-domain MinHashAgg (current)") {
      links.groupBy(col("link_domain"))
        .agg(graft.plans.MinHashAgg.of(col("link_text"),
          48 /* = SimilarityOps.MinhashHashes (private) */).as("sketch"))
        .count()
    }
    time("per-domain MinHashAgg (distinct-first)") {
      dt.distinct().groupBy(col("link_domain"))
        .agg(graft.plans.MinHashAgg.of(col("link_text"),
          48 /* = SimilarityOps.MinhashHashes (private) */).as("sketch"))
        .count()
    }
    time("full q41 (current)") {
      graft.SparkEntry.queries("q41_domain_sketch")(spark, dir).count()
    }
    spark.stop()
  }
}
