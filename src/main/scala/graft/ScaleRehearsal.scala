package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale rehearsal: run the near-dup pipeline on a 10x-replicated
  * corpus (50k docs) to observe candidate growth and wall-clock off
  * the official testdata sizes. Writes only to /tmp.
  */
object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = Tables.table(spark, "/root/testdata/sf0.1", "documents")
    val scaled = (0 until 10).map(i =>
      src.select((col("doc_id") + i * 1000000L).as("doc_id"),
        // perturb replicas so they are near- (not exact-) dups of each other
        concat(lit(s"v$i "), col("text")).as("text"),
        col("lang"), col("source"), (col("n_chars") + 3).as("n_chars")))
      .reduce(_ unionAll _)
    scaled.write.mode("overwrite").parquet("/tmp/sfx10/documents.parquet")
    println(s"docs: ${spark.read.parquet("/tmp/sfx10/documents.parquet").count()}")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-20s ${(System.nanoTime() - t0) / 1e9}%8.1fs  rows=$n")
    }
    time("q30_minhash_lsh")(operators.SimilarityOps.q30_minhash_lsh.run(spark, "/tmp/sfx10").count())
    time("q31_simhash")(operators.SimilarityOps.q31_simhash.run(spark, "/tmp/sfx10").count())
    time("q24_dedup_exact")(operators.TextOps.q24_dedup_exact.run(spark, "/tmp/sfx10").count())
    spark.stop()
  }
}
