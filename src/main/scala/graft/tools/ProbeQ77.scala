package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: q77 line-dedup cost decomposition. */
object ProbeQ77 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = graft.GraftConf.local(32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $what%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    time("warm q77")(graft.SparkEntry.queries("q77_line_dedup")(spark, dir).count())
    val docs = graft.Tables.docsWithNearDups(spark, dir, spread = false)
    time("docs floor")(docs.agg(sum(length(col("text")))).collect())
    val toks = docs.select(col("doc_id"),
      expr("regexp_extract_all(lower(text), '[a-z]+', 0)").as("toks"))
    time("tokenize")(toks.agg(sum(size(col("toks")))).collect())
    val LinesExpr =
      "if(size(toks) = 0, cast(array() as array<string>), " +
        "transform(sequence(0, cast(ceil(size(toks) / 10.0) as int) - 1), " +
        "i -> array_join(slice(toks, i * 10 + 1, 10), ' ')))"
    val lines = toks.select(col("doc_id"), posexplode(expr(LinesExpr)).as(Seq("pos", "line")))
      .select(col("doc_id"), col("pos"), col("line"), xxhash64(col("line")).as("lh"),
        (shiftleft(col("doc_id"), 21) + col("pos")).as("enc"))
    time("lines stream")(lines.agg(sum(col("lh") % 1000)).collect())
    val winners = lines.groupBy(col("lh")).agg(min(col("enc")).as("w"))
    time("winners agg")(winners.agg(sum(col("w") % 1000)).collect())
    val joined = lines.join(winners, "lh")
    time("join back")(joined.agg(sum(col("w") % 1000)).collect())
    time("q77 full")(graft.SparkEntry.queries("q77_line_dedup")(spark, dir).count())
    spark.stop()
  }
}
