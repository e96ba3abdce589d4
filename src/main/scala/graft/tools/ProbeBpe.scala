package graft.tools

import org.apache.spark.sql.functions._

/** r19: is the array_contains guard in front of bpeFit's interpreted
  * merge fold worth it at REAL vocab scale? The sf0.1/sf1 fixtures'
  * vocabs are too small to measure (job overhead drowns per-row cost;
  * interleaved A/B reads a wash both ways). This probe times one
  * guarded vs unguarded merge projection over a synthetic
  * 2M-distinct-word vocab with a late-merge hit rate (~1% of words
  * contain the pair) — the regime every merge step after the first
  * dozen sits in at crawl-scale vocab.
  */
object ProbeBpe {
  def main(a: Array[String]): Unit = {
    val n = if (a.length > 0) a(0).toInt else 2000000
    val spark = graft.GraftConf.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // ~1% of words contain 'q'+'x' adjacent; the rest are a-p chars
    val vocab = spark.range(n).select(
      expr("""split(concat(
        case when id % 100 = 0 then 'qx' else '' end,
        substring(repeat(char(97 + cast(id % 16 as int)), 8), 1, 8)), '')""")
        .as("syms"))
      .filter(size(col("syms")) > 0)
      .localCheckpoint()
    val merged = lit("qx")
    def fold = aggregate(col("syms"), array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit("q") && x === lit("x"),
          concat(slice(acc, lit(1), size(acc) - 1), array(merged)))
          .otherwise(concat(acc, array(x))))
    def guarded =
      when(array_contains(col("syms"), lit("q")) &&
        array_contains(col("syms"), lit("x")), fold).otherwise(col("syms"))
    def time(label: String, c: org.apache.spark.sql.Column): Unit = {
      vocab.select(c.as("out")).write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      (1 to 3).foreach(_ =>
        vocab.select(c.as("out")).write.format("noop").mode("overwrite").save())
      println(f"[probebpe] $label ${(System.nanoTime() - t0) / 3e9}%.2fs/pass over $n words")
    }
    time("unguarded fold", fold)
    time("guarded fold  ", guarded)
    spark.stop()
  }
}
