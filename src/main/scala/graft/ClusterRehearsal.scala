package graft

import org.apache.spark.sql.SparkSession

/** Multi-executor shakeout: the closest a sandbox gets to a real
  * cluster. `local-cluster[2,4,2048]` spawns TWO SEPARATE EXECUTOR
  * JVMs (not local-mode threads), so this run exercises what
  * `local[32]` structurally cannot:
  *
  *   - executor-side classloading of every custom Catalyst piece
  *     (expressions, `BoundedCollectSet`/`MinHashAgg` buffers,
  *     `TopKPerGroupExec`) in a JVM that never ran the driver;
  *   - real cross-JVM shuffle + partial-aggregate-buffer
  *     serialization (local mode short-circuits transport);
  *   - closure/literal shipping for the plan-embedded artifacts
  *     (q40's Lloyd centroid matrix, q34's hyperplanes, broadcast
  *     ignore lists).
  *
  * Counts are pinned against a plain local-mode run of the SAME
  * queries in the same process (sequential sessions — one
  * SparkContext at a time), so a divergence fails loudly. Run:
  *
  * {{{
  *   SPARK_SCALA_VERSION=2.13 sbt "runMain graft.ClusterRehearsal"
  * }}}
  *
  * (forked JVM carries the full classpath; executors inherit it via
  * extraClassPath. The env var is required: the worker's executor
  * launcher probes SPARK_HOME's build layout without it and dies
  * with "Cannot find any build directories".)
  */
object ClusterRehearsal {

  private val Sf = "/root/testdata/sf0.01"

  private def queries: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
    Seq(
      "q31_simhash" -> SparkEntry.queries("q31_simhash"),
      "q30_minhash_lsh" -> SparkEntry.queries("q30_minhash_lsh"),
      "q40_ivf_cosine" -> SparkEntry.queries("q40_ivf_cosine"),
      "q66_substring_dup" -> SparkEntry.queries("q66_substring_dup"),
      "q67_substring_scrub" -> SparkEntry.queries("q67_substring_scrub"),
      "q68_cocitation" -> SparkEntry.queries("q68_cocitation"),
      "q39_topk_per_group" -> SparkEntry.queries("q39_topk_per_group"),
      "q17_compact_links" -> SparkEntry.queries("q17_compact_links"),
      // r8: the cluster-keyed dedup self-join and the iterative vocab
      // fit both ship driver-built state (centroid/merge literals,
      // checkpointed frames) to fresh executor JVMs
      "q70_semdedup" -> SparkEntry.queries("q70_semdedup"),
      "q71_bpe_train" -> SparkEntry.queries("q71_bpe_train"),
      // r8b: PqEncode/PqAdc reference objects (codebook arrays) must
      // deserialize in executor JVMs; q74's propagation loop ships
      // checkpointed label frames; q75's merge fold chains 30 lambda
      // expressions built from driver-side fit state
      "q73_pq_ann" -> SparkEntry.queries("q73_pq_ann"),
      "q74_dedup_keep" -> SparkEntry.queries("q74_dedup_keep"),
      "q75_bpe_encode" -> SparkEntry.queries("q75_bpe_encode"),
      // r8c: q76's broadcast weight table + decimal cnt·w scoring,
      // q77's packed-bigint-min winner aggregate and doc rebuild, q78's
      // deferred-norm score chain across 8 checkpointed rounds, s08's
      // sliding-window explode through TopKPerGroupExec — all in
      // executor JVMs that never ran the driver
      "q76_dsir" -> SparkEntry.queries("q76_dsir"),
      "q77_line_dedup" -> SparkEntry.queries("q77_line_dedup"),
      // r9: q80's per-(source,line) doc-frequency aggregate + the
      // un-hinted boilerplate join-back, cross-JVM; q81's broadcast
      // eval gram set + row-local distinct-gram arrays
      "q80_boilerplate" -> SparkEntry.queries("q80_boilerplate"),
      "q81_contamination_rate" -> SparkEntry.queries("q81_contamination_rate"),
      "q78_hits" -> SparkEntry.queries("q78_hits"),
      "s08_stream_trending" -> SparkEntry.queries("s08_stream_trending"))

  private def session(master: String): SparkSession = {
    val b = SparkSession.builder()
      .master(master)
      .appName(s"graft-cluster-rehearsal-$master")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosAsLong, "true")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
    val withExec =
      if (master.startsWith("local-cluster")) b
        .config("spark.executor.memory", "2g")
        // executors are fresh JVMs spawned from SPARK_HOME — they need
        // the graft classes; the forked sbt JVM's classpath has them
        .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      else b
    withExec.getOrCreate()
  }

  private def runAll(master: String): Map[String, Long] = {
    val spark = session(master)
    spark.sparkContext.setLogLevel("ERROR")
    try queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val n = fn(spark, Sf).count()
      println(f"[cluster-rehearsal] $master%-24s $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.1fs rows=$n")
      name -> n
    }.toMap
    finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val local = runAll("local[8]")
    val cluster = runAll("local-cluster[2,4,2048]")
    val diverged = queries.map(_._1).filter(n => local(n) != cluster(n))
    if (diverged.nonEmpty) {
      diverged.foreach(n => System.err.println(
        s"[cluster-rehearsal] DIVERGED $n: local=${local(n)} cluster=${cluster(n)}"))
      sys.exit(1)
    }
    println(s"[cluster-rehearsal] OK: ${queries.size} queries identical across " +
      "local[8] and local-cluster[2,4,2048]")
  }
}
