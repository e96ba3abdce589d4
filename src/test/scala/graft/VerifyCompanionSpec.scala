package graft

import graft.operators.{SimilarityOps, TokenizerOps, WarcOps}
import graft.operators.StreamingBatchOps
import org.apache.spark.sql.functions._

/** The round-10 oracle companions (q32/q40/q73/q71/q59/s07 _verify +
  * the q35 flip): each one must agree with the float/rows-only query it
  * pins — otherwise a green DuckDB hash would certify a DIFFERENT
  * computation than the one users run.
  */
class VerifyCompanionSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet

  test("q32_verify ranks the same neighbors as float q32") {
    val float = pairs(SimilarityOps.q32_cosine_topk.run(spark, sfDir))
    val quant = pairs(SimilarityOps.q32_verify.run(spark, sfDir))
    assert(float.nonEmpty)
    // 1e-9 quantization can only reorder pairs whose cosines differ by
    // < 1e-9 — none exist in the testdata, so the id sets are EQUAL
    assert(quant == float, s"sym-diff: ${(quant diff float) ++ (float diff quant)}")
  }

  test("q40_verify ranks the same neighbors as float q40 (same candidates)") {
    val float = pairs(SimilarityOps.q40_ivf_cosine.run(spark, sfDir))
    val quant = pairs(SimilarityOps.q40_verify.run(spark, sfDir))
    assert(quant == float, s"sym-diff: ${(quant diff float) ++ (float diff quant)}")
  }

  test("q73_verify ranks the same neighbors as float q73 (same shortlist)") {
    val float = pairs(SimilarityOps.q73_pq_ann.run(spark, sfDir))
    val quant = pairs(SimilarityOps.q73_verify.run(spark, sfDir))
    assert(quant == float, s"sym-diff: ${(quant diff float) ++ (float diff quant)}")
  }

  test("q34_verify keeps exactly the float q34 pair set (same candidates)") {
    def ab(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val float = ab(SimilarityOps.q34_lsh_cosine.run(spark, sfDir))
    val quant = ab(SimilarityOps.q34_verify.run(spark, sfDir))
    assert(float.nonEmpty)
    // both filter the SAME dumped candidates at 0.99; the fixture has
    // no cosine inside [floor(0.99e9)/1e9, 0.99), so the sets are EQUAL
    assert(quant == float, s"sym-diff: ${(quant diff float) ++ (float diff quant)}")
  }

  test("q75_verify matches q75's word counts and dominates its token counts") {
    def byDoc(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens"))).toMap
    val full = byDoc(TokenizerOps.q75_bpe_encode.run(spark, sfDir))
    val short = byDoc(TokenizerOps.q75_verify.run(spark, sfDir))
    assert(full.nonEmpty && full.keySet == short.keySet)
    full.foreach { case (id, (nw, ntok30)) =>
      val (nw5, ntok5) = short(id)
      assert(nw5 == nw, s"doc $id word count diverged: $nw5 vs $nw")
      // a 5-merge prefix can only merge LESS than the full 30-merge fit
      assert(ntok5 >= ntok30, s"doc $id: 5-merge tokens $ntok5 < 30-merge $ntok30")
    }
  }

  test("q71_verify is the exact 5-merge prefix of the 30-merge q71 fit") {
    val full = TokenizerOps.q71_bpe_train.run(spark, sfDir)
      .orderBy(col("step")).collect()
      .map(r => (r.getAs[Int]("step"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_count")))
    val short = TokenizerOps.q71_verify.run(spark, sfDir)
      .orderBy(col("step")).collect()
      .map(r => (r.getAs[Int]("step"), r.getAs[String]("lsym"),
        r.getAs[String]("rsym"), r.getAs[Long]("pair_count")))
    assert(short.length == 5)
    assert(full.take(5).toSeq == short.toSeq)
  }

  test("corpus-scaled ANN parameters: floors pin every test SF, growth is logarithmic/linear") {
    // the floor is a CONTRACT for the small gate SFs (sf0.01's corpus
    // stays at 8 planes); the r16 recalibration moved the occupancy
    // target from ~32 to ~8 after the first sf100 recall row failed
    // the 0.9 gate (0.867 — skewed buckets past MaxBucket tombstone
    // pairs; the MEAN was fine, the TAIL was not), so sf0.1's 2080
    // vectors now sit one step past the floor
    for (n <- Seq(200L, 2000L))
      assert(SimilarityOps.lshPlanesFor(n) == 8, s"floor broken at n=$n")
    assert(SimilarityOps.lshPlanesFor(2080L) == 9)  // sf0.1: first step past
    assert(SimilarityOps.lshPlanesFor(20000L) == 12)  // sf1
    // bucket occupancy stays ≤ 8 EXPECTED at every scale — 8× headroom
    // to the MaxBucket=64 cap, because occupancy is a tail question:
    // ~32-mean occupancy measurably failed the sf100 recall gate
    for (n <- Seq(20000L, 200000L, 2000000L, 200000000L))
      assert(n.toDouble / (1L << SimilarityOps.lshPlanesFor(n)) <= 8.0,
        s"expected bucket occupancy leaves no cap headroom at n=$n")
    assert(SimilarityOps.pqShortlistFor(200L) == 128)
    assert(SimilarityOps.pqShortlistFor(2000L) == 128)  // sf0.1 unchanged
    // sf1: cells scale too (r12) — 39 cells, 22 probes, ~5% of the
    // candidate stream
    assert(SimilarityOps.pqShortlistFor(20000L) == 564)
    // the r12 corpus-scaled index constants: floor ≤ sf0.1, scaled above
    for (n <- Seq(200L, 2000L, 2080L))
      assert(SimilarityOps.ivfCellsFor(n) == 16, s"cell floor broken at n=$n")
    assert(SimilarityOps.ivfProbesFor(16) == 9) // probe floor at the cell floor
    assert(SimilarityOps.ivfCellsFor(20000L) == 39)   // sf1
    assert(SimilarityOps.ivfCellsFor(200000L) == 256) // sf10 (Lloyd cap)
    assert(SimilarityOps.ivfProbesFor(39) == 22)      // keeps the 9/16 fraction
    assert(SimilarityOps.ivfProbesFor(256) == 144)
  }

  test("PqLut is bit-identical to the HOF lut spelling") {
    // the r12 codegen swap's safety proof: the shortlist dumps the
    // oracles re-rank are selected on ADC = f(lut), so lut must not
    // move by even one ulp
    val e = Tables.embeddings(spark, sfDir)
    val pq = SimilarityOps.fitPq(SimilarityOps.embSample(e))
    val qs = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val hof = pq.withBooks(qs)
      .withColumn("q_nemb", expr(pq.normalized("q_emb")))
      .withColumn("lut", expr(pq.lutExpr("q_nemb")))
      .select(col("q_id"), col("lut")).collect()
      .map(r => r.getAs[Long]("q_id") -> r.getSeq[Double](1)).toMap
    val gen = qs.withColumn("lut", graft.plans.PqLut.of(col("q_emb"), pq.books))
      .select(col("q_id"), col("lut")).collect()
      .map(r => r.getAs[Long]("q_id") -> r.getSeq[Double](1)).toMap
    assert(gen.keySet == hof.keySet && gen.nonEmpty)
    gen.foreach { case (q, l) =>
      assert(l == hof(q), s"lut diverged for query $q")
    }
  }

  test("q48_verify rollup equals the direct q48 aggregate") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("ratio_decile"),
        r.getAs[Long]("n_docs"), r.getAs[Double]("min_ratio"),
        r.getAs[Double]("max_ratio"))).toSet
    val direct = rows(graft.operators.TextOps.q48_repetition.run(spark, sfDir))
    val dumped = rows(graft.operators.TextOps.q48_verify.run(spark, sfDir))
    assert(direct.nonEmpty)
    assert(dumped == direct)
  }

  test("q69_verify's pruned serving read equals the quantized float q69") {
    val served = graft.operators.GraphOps.q69_host_rank_serve.run(spark, sfDir)
      .collect().map(r => r.getAs[String]("host")).toList
    val quant = graft.operators.GraphOps.q69_verify.run(spark, sfDir)
      .collect().map(r => (r.getAs[String]("host"), r.getAs[Long]("rank_scaled")))
      .toList
    assert(quant.map(_._1) == served, "host sets diverged")
    // the full-artifact dump must agree with the pruned read row-for-row
    val dump = spark.read.parquet(Tables.oracleDumpPath("q69_ranks", sfDir))
      .collect().map(r => r.getAs[String]("host") -> r.getAs[Long]("rank_scaled")).toMap
    quant.foreach { case (h, rs) =>
      assert(dump(h) == rs, s"pruned read of $h diverged from the full artifact")
    }
  }

  test("q59_verify rollup equals q59 over the same WARC fixture") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("link_domain"), r.getAs[Long]("qty"),
        r.getAs[Long]("n_src_hosts"), r.getAs[Long]("n_paths"))).toSet
    val direct = rows(WarcOps.q59_warc_links.run(spark, sfDir))
    val dumped = rows(WarcOps.q59_verify.run(spark, sfDir))
    assert(direct.nonEmpty)
    assert(dumped == direct)
  }

  test("s07_verify rollup equals s07 shard membership") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("total_chars"), r.getAs[Long]("min_doc"),
        r.getAs[Long]("max_doc"))).toSet
    val direct = rows(StreamingBatchOps.s07_stream_export.run(spark, sfDir))
    val dumped = rows(StreamingBatchOps.s07_verify.run(spark, sfDir))
    assert(direct.nonEmpty)
    assert(dumped == direct)
  }

  test("q35 aggregate from the dump equals the direct decode aggregate") {
    // the dump round-trip must be semantically transparent: re-derive
    // the rollup straight from the decode frame (no dump) and compare
    val viaDump = SimilarityOps.q35_multimodal.run(spark, sfDir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_images"),
        r.getAs[Long]("total_bytes"), r.getAs[Long]("sum_width"),
        r.getAs[Long]("sum_height"), r.getAs[Long]("sum_features"))).toSet
    val direct = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text").cast("binary").as("payload"))
      .withColumn("n_bytes", expr("octet_length(payload)"))
      .withColumn("seed", expr("xxhash64(payload) & 4294967295"))
      .withColumn("width", (crc32(col("payload")) % 640 + 16).cast("int"))
      .withColumn("height", (expr("pmod(seed, 480)") + 16).cast("int"))
      .withColumn("features",
        expr("transform(sequence(0, 7), i -> pmod(seed * (2 * i + 61) + i, 1000))"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_images"),
        sum(col("n_bytes")).cast("bigint").as("total_bytes"),
        sum(col("width")).cast("bigint").as("sum_width"),
        sum(col("height")).cast("bigint").as("sum_height"),
        sum(expr("aggregate(features, cast(0 as bigint), (acc, v) -> acc + v)"))
          .cast("bigint").as("sum_features"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_images"),
        r.getAs[Long]("total_bytes"), r.getAs[Long]("sum_width"),
        r.getAs[Long]("sum_height"), r.getAs[Long]("sum_features"))).toSet
    assert(viaDump == direct)
  }
}
