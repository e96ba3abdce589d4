package graft.tools

/** r19: how much of every query's fixed cost is the eager
  * listing+schema-inference `spark.read.parquet` pays per call, and
  * does supplying the schema (skipping footer inference) matter?
  */
object ProbeRead {
  def main(a: Array[String]): Unit = {
    val dir = if (a.length > 0) a(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftConf.local(8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("orders", "customer", "documents", "embeddings", "lineitem")
    def timed(label: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (1 to 20).foreach(_ => f)
      println(f"[proberead] $label ${(System.nanoTime() - t0) / 20e6}%.1f ms/call")
    }
    timed("read.parquet (inferred)") {
      names.foreach(n => spark.read.parquet(s"$dir/$n.parquet"))
    }
    val schemas = names.map(n => n -> spark.read.parquet(s"$dir/$n.parquet").schema).toMap
    timed("read.schema(...).parquet") {
      names.foreach(n => spark.read.schema(schemas(n)).parquet(s"$dir/$n.parquet"))
    }
    spark.stop()
  }
}
