package graft.tools

import org.apache.spark.sql.functions._

/** Emission-volume scaling probe for q29's prefix self-join (dev
  * tool): counts post-screen pair EMISSIONS (pre-distinct) and the
  * distinct candidate set, per dir — the two numbers that size the
  * candidate stage's exchange/spill at the next 10×.
  *
  * {{{ tools/run_main.sh graft.tools.ProbeQ29e /tmp/graft_sf1 /tmp/graft_sf10 }}}
  */
object ProbeQ29e {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/tmp/graft_sf1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = graft.GraftConf.local(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dirs.foreach { dir =>
      val docs = graft.operators.TextOps.probeShingled(spark, dir)
      val k1 = graft.operators.TextOps.probeKeyed(docs).localCheckpoint()
      val nKeys = k1.count()
      val emitOk =
        lit(9L) * (lit(1L) + least(col("a_sz") - col("a_pos") - 1,
          col("b_sz") - col("b_pos") - 1)) >= lit(4L) * (col("a_sz") + col("b_sz"))
      val emissions = k1.select(col("bk"), col("doc_id").as("a_id"),
          col("pos").as("a_pos"), col("sz").as("a_sz"), col("sk").as("a_sk"))
        .hint("merge")
        .join(k1.select(col("bk"), col("doc_id").as("b_id"),
          col("pos").as("b_pos"), col("sz").as("b_sz"), col("sk").as("b_sk"))
          .hint("merge"),
          Seq("bk"))
        .filter(col("a_id") < col("b_id"))
      val nRaw = emissions.count()
      val nScreened = emissions.filter(emitOk).count()
      val nSketch = emissions.filter(emitOk &&
        graft.plans.JaccardSketchPass.of(col("a_sk"), col("b_sk"))).count()
      val nDistinct = graft.operators.TextOps.probeCand(docs).count()
      // top-10 hottest prefix keys: is the emission volume a hot-group
      // phenomenon (Σg² driven by a few giant groups)?
      val hot = k1.groupBy(col("bk")).count()
        .orderBy(col("count").desc).limit(10)
        .collect().map(_.getLong(1)).mkString(",")
      println(s"[q29e] $dir keys=$nKeys rawEmit=$nRaw screenedEmit=$nScreened " +
        s"sketchEmit=$nSketch distinct=$nDistinct hotGroups=[$hot]")
    }
    spark.stop()
  }
}
