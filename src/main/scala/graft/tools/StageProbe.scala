package graft.tools

import org.apache.spark.sql.GraftProbeBridge
import org.apache.spark.sql.functions._

/** Ad-hoc stage timer for perf triage (dev tool, not part of the
  * driver contract): times the component stages of a named query so a
  * bench regression can be attributed to a stage instead of guessed
  * at. Currently knows q73's stages.
  *
  * {{{ sbt "runMain graft.tools.StageProbe /tmp/graft_sf10" }}}
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = graft.GraftConf.local(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $what%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    import graft.operators.SimilarityOps
    // warm run first so we time steady state, like Bench's best-of-two
    SimilarityOps.q73_pq_ann.run(spark, dir).count()
    val e = graft.Tables.embeddings(spark, dir)
    val n = time("embCount")(e.count())
    val sample = time("embSample")(SimilarityOps.embSample(e))
    val cells = SimilarityOps.ivfCellsFor(n)
    println(s"[probe] cells=$cells probes=${SimilarityOps.ivfProbesFor(cells)} " +
      s"shortlist=${SimilarityOps.pqShortlistFor(n)}")
    val ivf = time("fitIvf (driver Lloyd)")(SimilarityOps.fitIvfK(sample, cells))
    time("fitPq (driver Lloyd)")(SimilarityOps.fitPq(sample))
    time("assignCell corpus")(ivf.assignCell(e).select(col("cell")).groupBy(col("cell")).count().count())
    // decompose pqShortlist: encode, probe-side, ADC join, heap
    val pq = SimilarityOps.fitPq(sample)
    val enc = ivf.assignCell(e)
      .withColumn("codes", graft.plans.PqEncode.of(col("embedding"), pq.books))
      .select(col("vec_id").as("n_id"), col("cell"), col("codes"))
    time("encode corpus")(enc.count())
    val probes = {
      val qs = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val probeN = SimilarityOps.ivfProbesFor(ivf.n)
      val probed = ivf.withCentroids(qs)
        .withColumn("cell", explode(expr(
          s"transform(slice(array_sort(transform(sequence(0, ${ivf.n - 1}), i -> " +
            s"struct(-(${ivf.cellScore("q_emb")}) as ns, i as cell))), 1, $probeN), " +
            "p -> p.cell)")))
        .select(col("q_id"), col("q_emb"), col("cell"))
      pq.withBooks(probed)
        .withColumn("q_nemb", expr(pq.normalized("q_emb")))
        .withColumn("lut", expr(pq.lutExpr("q_nemb")))
        .select(col("q_id"), col("q_emb"), col("cell"), col("lut"))
    }
    time("probe side")(probes.count())
    val adc = enc.join(broadcast(probes), "cell")
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("adc", graft.plans.PqAdc.of(col("lut"), col("codes"), pq.k))
    println(s"[probe] adc candidate rows = ${time("adc join count")(adc.count())}")
    time("adc sum (forces eval)")(adc.agg(sum(col("adc"))).count())
    val narrow = adc.select(col("q_id"), col("n_id"), col("adc"))
    time("narrow toRdd count")(
      GraftProbeBridge.toRdd(narrow).count())
    time("manual partial-heap over toRdd")(
      GraftProbeBridge.manualHeap(narrow, 5625))
    time("adc+topk k=562")(graft.plans.TopKPerGroup(adc,
      Seq(col("q_id")), Seq(col("adc").desc, col("n_id")), 562).count())
    time("adc+topk narrow rows")(graft.plans.TopKPerGroup(
      adc.select(col("q_id"), col("n_id"), col("adc")),
      Seq(col("q_id")), Seq(col("adc").desc, col("n_id")),
      SimilarityOps.pqShortlistFor(n)).count())
    time("adc+topk shortlist")(graft.plans.TopKPerGroup(adc,
      Seq(col("q_id")), Seq(col("adc").desc, col("n_id")),
      SimilarityOps.pqShortlistFor(n)).count())
    time("pqShortlist end-to-end")(SimilarityOps.pqShortlist(spark, dir).count())
    time("q73 full")(SimilarityOps.q73_pq_ann.run(spark, dir).count())
    time("q40 full")(SimilarityOps.q40_ivf_cosine.run(spark, dir).count())
    spark.stop()
  }
}
