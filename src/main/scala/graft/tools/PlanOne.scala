package graft.tools

/** Dev helper: print the formatted physical plan of one registered query. */
object PlanOne {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftConf.local(8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (a.length > 1) a(1) else "/root/testdata/sf0.01"
    val df = graft.SparkEntry.queries(a(0))(spark, dir)
    df.explain("formatted")
    spark.stop()
  }
}
