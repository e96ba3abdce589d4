package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: q56 cost decomposition — links floor, canonicalize, agg. */
object ProbeQ56 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = graft.GraftConf.local(32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $what%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    time("warm q56")(graft.SparkEntry.queries("q56_url_canonical")(spark, dir).count())
    val links = graft.Tables.links(spark, dir)
    time("links floor")(links.agg(sum(length(col("link_path")))).collect())
    val base = links.select(
      when(col("link_scheme") === "2", lit("https")).otherwise(lit("http")).as("scheme"),
      concat(when(col("link_subdomain") === "", lit(""))
        .otherwise(concat(col("link_subdomain"), lit("."))), col("link_domain")).as("host"),
      col("link_path").as("path"), col("link_rawquery").as("q"),
      col("qty"), col("src_key"))
    val variants = base.filter(col("src_key") % 7 === 0).select(
      col("scheme"), upper(col("host")).as("host"),
      concat(col("path"), lit("/")).as("path"),
      when(col("q") === "", lit("utm_source=feed&utm_campaign=x"))
        .otherwise(concat(col("q"), lit("&utm_source=feed&utm_campaign=x"))).as("q"),
      col("qty"), col("src_key"))
    val u = base.unionByName(variants)
    time("union floor")(u.agg(sum(length(col("q")))).collect())
    val cq = u.withColumn("cq", expr(
      "array_join(array_sort(filter(split(q, '&'), p -> NOT (" +
        "startswith(p, 'utm_') OR startswith(p, 'fbclid=') OR startswith(p, 'gclid=')))), '&')"))
    time("hof cq")(cq.agg(sum(length(col("cq")))).collect())
    val canon = cq.withColumn("canonical_url", concat(
      col("scheme"), lit("://"), lower(col("host")),
      regexp_replace(col("path"), "/+$", ""),
      when(col("cq") === "", lit("")).otherwise(concat(lit("?"), col("cq")))))
    time("canon url")(canon.agg(sum(length(col("canonical_url")))).collect())
    time("full q56 again")(graft.SparkEntry.queries("q56_url_canonical")(spark, dir).count())
    spark.stop()
  }
}
