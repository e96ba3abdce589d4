package graft.tools

import org.apache.spark.sql.functions._

/** The full `Pipeline.exportCorpus` funnel at a named SF dir — the
  * r17 composition rehearsal (verdict item 5): every stage has been
  * sf100-proven individually, but the orchestrated end-to-end (gate →
  * boilerplate strip → line dedup → near-dedup → SemDeDup →
  * decontaminate → select → shard) had only ever run at 50k docs.
  * All optional stages ON; funnel counts + total wall print as one
  * JSON line for the trials record.
  *
  *   SPARK_DRIVER_MEM=48g tools/run_main.sh graft.tools.ExportRehearsal \
  *     /tmp/graft_sf100 /tmp/graft_export_sf100/corpus
  */
object ExportRehearsal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf100")
    val out = if (args.length > 1) args(1) else "/tmp/graft_export_rehearsal/corpus"
    // "nogate": skip the quality gate so the dedup/decontaminate/select
    // stages compose at FULL corpus size (the synthetic docs fail the
    // gopher gate ~99.98%, so the gated funnel never feeds them more
    // than ~1k docs)
    val gate = !args.contains("nogate")
    // "plantsem": replace vec b+1 with a 0.001-nudged copy of vec b for
    // b % 25 == 0 (the PipelineSpec victim pattern at full width) so
    // the SemDeDup stage drops real mass inside the doc-id range —
    // the organic testdata has no cos >= 0.99 pairs below EmbDupOffset
    val plantSem = args.contains("plantsem")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = graft.GraftConf.local(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = graft.Tables.table(spark, dir, "documents").count()
    // target ~20% of the corpus through the mix selector so selection
    // does real work; shards stay loader-sized
    val mixTarget = math.max(1000L, docs / 5).min(Int.MaxValue).toInt
    val emb0 = graft.Tables.table(spark, dir, "embeddings")
    val emb = if (!plantSem) emb0 else {
      val victims = emb0.filter(col("vec_id") % 25 === 0)
        .select((col("vec_id") + 1).as("vec_id"),
          expr("transform(embedding, (x, i) -> if(i = 0, cast(x + 0.001f as float), x))")
            .as("embedding"), col("label"))
      emb0.filter(col("vec_id") % 25 =!= 1).unionAll(victims)
    }
    val t0 = System.nanoTime()
    val st = graft.Pipeline.exportCorpus(spark, dir, out,
      mixTarget = mixTarget, docsPerShard = 100000,
      semdedupEmb = Some(emb),
      lineDedup = true, boilerplate = true,
      contamRatePct = Some(10),
      dsirTarget = Some(col("source").isin("src0", "src1")),
      gate = gate)
    val wall = math.rint((System.nanoTime() - t0) / 1e7) / 100
    println(
      s"""{"export_rehearsal":{"dir":"$dir","gate":$gate,"plant_sem":$plantSem,""" +
      s""""wall_s":$wall,"docs":$docs,""" +
      s""""mix_target":$mixTarget,"input":${st.input},"gated":${st.gated},""" +
      s""""boilerplated":${st.boilerplated},"line_deduped":${st.lineDeduped},""" +
      s""""deduped":${st.deduped},"semdeduped":${st.semdeduped},""" +
      s""""decontaminated":${st.decontaminated},"exported":${st.exported},""" +
      s""""shards":${st.shards}}}""")
    spark.stop()
  }
}
