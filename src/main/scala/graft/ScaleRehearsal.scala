package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale rehearsal: run the near-dup pipeline on a 10x-replicated
  * corpus (50k docs) to observe candidate growth and wall-clock off
  * the official testdata sizes. Writes only to /tmp.
  */
object ScaleRehearsal {

  private def session(): SparkSession = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosAsLong, "true").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def timeIt(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"$name%-20s ${(System.nanoTime() - t0) / 1e9}%8.1fs  rows=$n")
  }

  /** Decontamination eval-shape A/B over an existing sf dir: the q53
    * fixture's eval set is a PROPORTIONAL 2% slice of the corpus, so
    * the broadcast eval-gram set (and the matched-gram stream) grows
    * WITH the corpus and the fixture's wall-clock bends superlinear at
    * 100× (the sf10 scaling table). Production eval sets are
    * FIXED-SIZE benchmarks; this probe pins that with eval pinned at
    * 500 docs the same operator tracks the corpus ~linearly.
    *
    *   sbt "runMain graft.ScaleRehearsal fixedEval /tmp/graft_sf10"
    */
  private def fixedEvalProbe(dir: String): Unit = {
    val spark = session()
    val docs = Tables.table(spark, dir, "documents")
    timeIt("contam_prop_2pct")(operators.TextOps.contamination(
      docs.filter(col("doc_id") % 50 =!= 7),
      docs.filter(col("doc_id") % 50 === 7)).count())
    timeIt("contam_fixed_500")(operators.TextOps.contamination(
      docs.filter(col("doc_id") >= 500),
      docs.filter(col("doc_id") < 500)).count())
    spark.stop()
  }

  /** Scaled-cell SemDeDup probe over a MakeScale dir: the production
    * clustering with k ∝ corpus ([[operators.SimilarityOps.semdedupCellsFor]]).
    * Wall-clock must stay ~flat per vector (clusters held ~512-wide)
    * and every planted near-dup must still drop — ≥ 0.99 pairs share
    * their argmax cell under any k.
    *
    *   sbt "runMain graft.ScaleRehearsal semdedup /tmp/graft_sf10"
    */
  private def semdedupProbe(dir: String): Unit = {
    val spark = session()
    val e = Tables.embWithNearDups(spark, dir)
    val n = e.count()
    val cells = operators.SimilarityOps.semdedupCellsFor(n)
    val idx = operators.SimilarityOps.fitIvfK(
      operators.SimilarityOps.embSample(e), cells)
    val t0 = System.nanoTime()
    val dropped = operators.SimilarityOps
      .semdedupVerdicts(idx.assignCell(e), col("cell"))
      .filter(!col("kept")).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val planted = Tables.table(spark, dir, "embeddings")
      .filter(col("vec_id") % Tables.DupEvery === 0).select("vec_id")
      .collect().map(_.getLong(0) + Tables.EmbDupOffset).toSet
    val recall = planted.count(dropped).toDouble / planted.size
    println(f"semdedup_scaled      ${(System.nanoTime() - t0) / 1e9}%8.1fs  " +
      f"n=$n cells=$cells dropped=${dropped.size} planted_recall=$recall%.3f")
    require(recall >= 0.99, s"planted semdedup recall $recall under scaled cells")
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.nonEmpty && args(0) == "fixedEval")
      return fixedEvalProbe(if (args.length > 1) args(1) else "/tmp/graft_sf10")
    if (args.nonEmpty && args(0) == "semdedup")
      return semdedupProbe(if (args.length > 1) args(1) else "/tmp/graft_sf10")
    val spark = session()
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
    // q36's scale path: cluster from the LSH pairs (bucketed candidate
    // generation) instead of q29's length-blocked pairs — the pair
    // source is the only thing that changes; the propagation loop is
    // shared. Cost must stay near-flat vs the pair count, not the
    // corpus size
    time("cluster_lsh_pairs")(operators.TextOps.clusterPairs(
      operators.SimilarityOps.q30_minhash_lsh.run(spark, "/tmp/sfx10")).count())
    time("q31_simhash")(operators.SimilarityOps.q31_simhash.run(spark, "/tmp/sfx10").count())
    time("q24_dedup_exact")(operators.TextOps.q24_dedup_exact.run(spark, "/tmp/sfx10").count())
    // q41 banded sketch join at 2k and 20k domains: 5% of domains have a
    // near-dup partner, everything else is disjoint — output pairs (and
    // wall-clock) must scale ~linearly in domains, not quadratically,
    // because candidates come from band buckets rather than all pairs
    time("q41_sketch_2k")(operators.SimilarityOps.sketchPairs(sketchCorpus(spark, 2000)).count())
    time("q41_sketch_20k")(operators.SimilarityOps.sketchPairs(sketchCorpus(spark, 20000)).count())
    // the one-aggregate compaction and the broadcast-gram decontamination
    // must scale ~linearly: both are single-shuffle plans
    time("q17_compact_links")(operators.LinkCompaction.compact(
      (0 until 10).map(_ => Tables.links(spark, "/root/testdata/sf0.1"))
        .reduce(_ unionAll _)).count())
    time("q53_decontaminate")(operators.TextOps.q53_decontaminate.run(spark, "/tmp/sfx10").count())
    // q60's production shape at 10x: a ~2k-doc delta against the 50k
    // corpus — wall-clock must track the DELTA-side join (the corpus
    // contributes one signature scan + one bucket count, never pairs
    // with itself)
    val base10 = spark.read.parquet("/tmp/sfx10/documents.parquet")
      .select(col("doc_id"), col("text"))
    val delta10 = base10.filter(col("doc_id") % 250 === 0)
      .select((col("doc_id") + 100000000L).as("doc_id"),
        concat(lit("Z"), expr("substr(text, 2)")).as("text"))
    time("q60_delta_10x")(
      operators.SimilarityOps.deltaDedupPairs(base10, delta10).count())
    // the single-scan text passes must stay ~linear in the corpus
    time("q61_bm25")(operators.TextOps.q61_bm25.run(spark, "/tmp/sfx10").count())
    time("q62_pii_scrub")(operators.TextOps.q62_pii_scrub.run(spark, "/tmp/sfx10").count())
    time("q64_perplexity")(operators.TextOps.q64_perplexity_bucket.run(spark, "/tmp/sfx10").count())
    // r8: DSIR's one-scan fit+score (per-doc bucket counts are the
    // sufficient statistic) and the line-dedup pass — both must track
    // the corpus linearly
    time("q76_dsir_10x")(operators.CurationOps.q76_dsir.run(spark, "/tmp/sfx10").count())
    time("q77_line_10x")(operators.CurationOps.q77_line_dedup.run(spark, "/tmp/sfx10").count())
    // DEGENERATE-KEY rehearsal: the hot-bucket guard under fire. A
    // boilerplate 8-token window shared by EVERY one of 50k docs (the
    // q66 shape) and a constant text shared by 50k docs (every SimHash
    // chunk bucket degenerate — the q31 shape). With the post-hoc
    // collect_list cap these built 50k-element buffers in one reducer
    // before filtering; BoundedCollectSet must complete them with
    // per-key state ≤ MaxBucket+1 — watch for flat wall-clock, not
    // just completion.
    val boiler = (0 until 8).map(i => s"boil$i").mkString(" ")
    spark.range(50000).selectExpr("id AS doc_id",
        s"concat('$boiler ', 'u', id, 'a u', id, 'b u', id, 'c') AS text",
        "11 AS n_chars")
      .write.mode("overwrite").parquet("/tmp/sfhot/documents.parquet")
    time("q66_hot_window")(operators.TextOps.q66_substring_dup.run(spark, "/tmp/sfhot").count())
    // the scrub on the same hot corpus: the boilerplate window is a
    // duplicated hash with ONE global first — stats stay a 16-byte
    // min/count buffer per hash, and 50k docs lose their span
    time("q67_hot_scrub")(operators.TextOps.q67_substring_scrub.run(spark, "/tmp/sfhot").count())
    // and at 10x organic scale: cost must track duplication density
    time("q67_scrub_10x")(operators.TextOps.substringScrub(
      spark.read.parquet("/tmp/sfx10/documents.parquet")
        .select(col("doc_id"), col("text"))).count())
    spark.range(50000).selectExpr("id AS doc_id",
        "'the same text everywhere in all of them' AS text", "40 AS n_chars")
      .write.mode("overwrite").parquet("/tmp/sfconst/documents.parquet")
    time("q31_hot_band")(operators.SimilarityOps.q31_simhash.run(spark, "/tmp/sfconst").count())
    // q77 on the constant corpus: every line of every doc is THE same
    // line — the packed-bigint-min winner aggregate must collapse it map-side
    // (flat wall-clock), the join-back hot key rides AQE skew handling,
    // and exactly one doc keeps its text
    time("q77_hot_line")(operators.CurationOps.q77_line_dedup.run(spark, "/tmp/sfconst").count())
    // r9: q80 at 10x organic scale — the per-(source,line) document
    // frequency is two hash aggregates on the same key prefix; cost
    // must track the line stream linearly
    time("q80_boiler_10x")(operators.CurationOps.boilerplateStrip(
      spark.read.parquet("/tmp/sfx10/documents.parquet")
        .select(col("doc_id"), col("source"), col("text"))).count())
    // r9: q81's fraction rule at 10x — the per-doc total stays in the
    // scan stage (row-local array_distinct), so cost must track the
    // corpus linearly with only eval-matching grams shuffling
    time("q81_contam_10x")(
      operators.TextOps.q81_contamination_rate.run(spark, "/tmp/sfx10").count())
    // q80 degenerate-source rehearsal: ONE line repeated across every
    // doc of each source (50k docs, 5 sources). The (source, lh)
    // distinct + count must collapse map-side (flat wall-clock), the
    // join-back hot key rides AQE, and every doc strips to empty
    // (n_kept = 0 across the board)
    spark.range(50000).selectExpr("id AS doc_id",
        "concat('src', id % 5) AS source",
        "'the same chrome on every page of the site' AS text")
      .write.mode("overwrite").parquet("/tmp/sfsrcconst/documents.parquet")
    time("q80_hot_boiler")(operators.CurationOps.boilerplateStrip(
      spark.read.parquet("/tmp/sfsrcconst/documents.parquet")).count())
    // r9: the FULL delivery funnel at 10x with every optional stage
    // on — boilerplate strip + line dedup + SemDeDup + DSIR. The run
    // must complete with flat executor memory (every state frame is
    // pair-, host-, or benchmark-sized, never corpus-sized); stage
    // yields print so a selectivity regression is visible
    val embSrc = Tables.table(spark, "/root/testdata/sf0.1", "embeddings")
    // copy offset derived from the base table, not a constant: a fixed
    // 1e6 stride would silently collide copies (shifting SemDeDup
    // selectivity) if the base table ever outgrows it
    val embStride = embSrc.agg(max(col("vec_id"))).head.getLong(0) + 1L
    val scaledEmb = (0 until 10).map(i =>
      embSrc.select((col("vec_id") + i * embStride).as("vec_id"),
        col("embedding"), col("label")))
      .reduce(_ unionAll _)
    val t0 = System.nanoTime()
    val st = Pipeline.exportCorpus(spark, "/tmp/sfx10", "/tmp/sfx10_export/corpus",
      mixTarget = 5000, docsPerShard = 1000,
      semdedupEmb = Some(scaledEmb), lineDedup = true, boilerplate = true,
      dsirTarget = Some(col("source").isin("src0", "src1")))
    println(f"exportCorpus_10x     ${(System.nanoTime() - t0) / 1e9}%8.1fs  $st")
    spark.stop()
  }

  /** n domains x 20 link texts. Texts are (domain,slot)-unique except:
    * domains d in [n/2, n/2 + n/20) share 18 of 20 texts with partner
    * d - n/2 (set Jaccard 18/22 ~ 0.82). Expected pairs ~ n/20.
    */
  private def sketchCorpus(spark: SparkSession, n: Int) =
    spark.range(n.toLong * 20)
      // `div`, not `/`: Column./ is double division
      .select(expr("id div 20").as("d"), (col("id") % 20).as("j"))
      .select(
        concat(lit("dom"), col("d")).as("link_domain"),
        concat(lit("w"), when(
          col("d") >= n / 2 && col("d") < n / 2 + n / 20 && col("j") < 18,
          (col("d") - n / 2) * 31 + col("j"))
          .otherwise(col("d") * 31 + col("j"))).as("link_text"))
      .repartition(spark.sparkContext.defaultParallelism)
}
