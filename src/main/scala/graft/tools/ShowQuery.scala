package graft.tools

/** Dev helper: run one registered query and print its rows (small outputs). */
object ShowQuery {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftConf.local(32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (a.length > 1) a(1) else "/root/testdata/sf0.01"
    graft.SparkEntry.queries(a(0))(spark, dir).show(50, false)
    spark.stop()
  }
}
