package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._

/** §2C (continued) — near-duplicate detection and similarity search at
  * scale: MinHash+LSH, SimHash, brute-force + LSH-bucketed cosine ANN,
  * embedding aggregates, multimodal binary-column plumbing.
  *
  * Scale design: every candidate-generation step is a `groupBy(bucket)`
  * (one shuffle, map-side partial agg) followed by WITHIN-bucket pair
  * expansion from a sorted id array — never an O(n²) self-join. Buckets
  * are capped (`MaxBucket`) so a degenerate hot bucket cannot produce
  * quadratic pairs; exact verification only runs on candidate pairs.
  * All per-row math is built-in higher-order array functions
  * (codegen-friendly, no UDFs).
  */
object SimilarityOps {

  /** Hot-bucket guard: a bucket with more members than this is dropped
    * from candidate generation (at 100 TB a degenerate bucket would
    * otherwise emit |bucket|² pairs).
    */
  private val MaxBucket = 64

  /** `ids` (sorted array) → all a<b pairs, as structs. */
  private val pairExpr =
    "flatten(transform(ids, (a, i) -> " +
      "transform(slice(ids, i + 2, size(ids)), b -> named_struct('a_id', a, 'b_id', b))))"

  private val MinhashHashes = 32
  private val MinhashBands = 8
  private val MinhashRows = MinhashHashes / MinhashBands

  /** MinHash + banded LSH near-dup pairs, exact-Jaccard verified.
    *
    * shingle(3-gram) → 32 minhashes → 8 bands × 4 rows → band-bucket
    * groupBy → within-bucket candidate pairs → exact Jaccard on the
    * candidates only. With b=8,r=4 the LSH S-curve crosses ~0.6, so
    * 0.8-similar docs are caught with prob ≈ 1-(1-0.8⁴)⁸ ≈ 0.986.
    * Reference analogue: dedup-by-hash in importer (main.go:237-247),
    * generalized to near-dup.
    */
  val q30_minhash_lsh: GraftQuery = GraftQuery(
    "q30_minhash_lsh",
    (s, dir) => {
      val docs = Tables.docsWithNearDups(s, dir)
        .select(col("doc_id"),
          array_distinct(expr(
            "transform(sequence(1, greatest(length(text) - 2, 1)), i -> substring(text, i, 3))"))
            .as("shingles"))
      val sig = docs.withColumn("sig",
        expr(s"transform(sequence(0, ${MinhashHashes - 1}), " +
          "h -> array_min(transform(shingles, sh -> xxhash64(concat(cast(h as string), ':', sh)))))"))
      val bands = sig.select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, ${MinhashBands - 1}), " +
            s"b -> xxhash64(concat_ws(',', transform(slice(sig, b * $MinhashRows + 1, $MinhashRows), " +
            "x -> cast(x as string)))))")).as(Seq("band_id", "band_hash")))
      val pairs = bands
        .groupBy(col("band_id"), col("band_hash"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")).between(2, MaxBucket))
        .select(explode(expr(pairExpr)).as("p"))
        .select(col("p.a_id"), col("p.b_id"))
        .distinct()
      val a = docs.select(col("doc_id").as("a_id"), col("shingles").as("a_sh"))
      val b = docs.select(col("doc_id").as("b_id"), col("shingles").as("b_sh"))
      pairs.join(a, "a_id").join(b, "b_id")
        .withColumn("inter", size(array_intersect(col("a_sh"), col("b_sh"))))
        .withColumn("uni", size(col("a_sh")) + size(col("b_sh")) - col("inter"))
        .withColumn("jaccard", col("inter").cast("double") / col("uni").cast("double"))
        .filter(col("jaccard") >= 0.8)
        .select(col("a_id"), col("b_id"), col("jaccard"))
    },
    None // LSH banding is not ANSI-SQL-expressible; exactness covered by SimilaritySpec
  )

  /** 64-bit SimHash near-dup: per-token 64-bit hashes vote per bit
    * position; sign → signature bit. Near-dups = hamming ≤ 3, found by
    * the 4-chunk pigeonhole (two docs within hamming 3 share at least
    * one exact 16-bit chunk), so candidates come from a chunk-bucket
    * groupBy instead of all-pairs.
    */
  val q31_simhash: GraftQuery = GraftQuery(
    "q31_simhash",
    (s, dir) => {
      val docs = Tables.docsWithNearDups(s, dir)
        .select(col("doc_id"),
          expr("transform(split(text, ' '), t -> xxhash64(t))").as("hs"))
        .withColumn("sig", expr(
          "aggregate(sequence(0, 63), cast(0 as bigint), (acc, b) -> " +
            "acc | if(aggregate(hs, 0, (v, h) -> v + cast((shiftright(h, b) & 1) * 2 - 1 as int)) > 0, " +
            "shiftleft(cast(1 as bigint), b), cast(0 as bigint)))"))
      val sigs = docs.select(col("doc_id"), col("sig"))
      val chunks = sigs.select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, 3), i -> shiftright(sig, i * 16) & 65535)"))
          .as(Seq("chunk_id", "chunk_val")))
      val pairs = chunks
        .groupBy(col("chunk_id"), col("chunk_val"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")).between(2, MaxBucket))
        .select(explode(expr(pairExpr)).as("p"))
        .select(col("p.a_id"), col("p.b_id"))
        .distinct()
      pairs
        .join(sigs.select(col("doc_id").as("a_id"), col("sig").as("a_sig")), "a_id")
        .join(sigs.select(col("doc_id").as("b_id"), col("sig").as("b_sig")), "b_id")
        .withColumn("hamming", expr("bit_count(a_sig ^ b_sig)"))
        .filter(col("hamming") <= 3)
        .select(col("a_id"), col("b_id"), col("hamming"))
    },
    None // bit-vote signature not SQL-expressible; covered by SimilaritySpec
  )

  private val dotExpr =
    "aggregate(zip_with(q_emb, n_emb, (x, y) -> cast(x as double) * cast(y as double)), " +
      "cast(0 as double), (acc, v) -> acc + v)"
  private def normExpr(c: String) =
    s"sqrt(aggregate(transform($c, x -> cast(x as double) * cast(x as double)), " +
      "cast(0 as double), (acc, v) -> acc + v))"

  /** Brute-force cosine top-k ANN baseline: the exact answer the LSH
    * path (q34) approximates. Queries are broadcast, candidates stream;
    * per-query top-k via rank window partitioned on the (small) query
    * side. At 100 TB the candidate scan is embarrassingly parallel and
    * never shuffles — only the k results per query move.
    */
  val q32_cosine_topk: GraftQuery = GraftQuery(
    "q32_cosine_topk",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.table(s, dir, "embeddings")
      val qs = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val cand = e.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cosine").desc, col("n_id"))
      cand.join(broadcast(qs), col("n_id") =!= col("q_id"))
        .withColumn("cosine",
          expr(dotExpr) / (expr(normExpr("q_emb")) * expr(normExpr("n_emb"))))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("q_id"), col("n_id"), col("rank"), round(col("cosine"), 6).as("cosine"))
    },
    None // float-order across engines; exactness covered by SimilaritySpec
  )

  /** Vector aggregates: per-label count, total dim, and an exact sum of
    * per-row rounded norms (row-local double math → round(…,4) →
    * DECIMAL sum, so the cross-row aggregation is order-independent).
    */
  val q33_embed_stats: GraftQuery = GraftQuery(
    "q33_embed_stats",
    (s, dir) =>
      Tables.table(s, dir, "embeddings")
        .select(col("label"), size(col("embedding")).as("dim"),
          round(expr(normExpr("embedding")), 4).as("norm_r"))
        .groupBy(col("label"))
        .agg(
          count(lit(1)).as("n_vecs"),
          sum(col("dim")).cast("bigint").as("total_dim"),
          sum(col("norm_r").cast("decimal(20,4)")).cast("double").as("sum_norm"),
          max(col("norm_r")).as("max_norm"),
          min(col("norm_r")).as("min_norm")),
    Some("""SELECT label, COUNT(*) AS n_vecs,
           |  CAST(SUM(dim) AS BIGINT) AS total_dim,
           |  CAST(SUM(CAST(norm_r AS DECIMAL(20,4))) AS DOUBLE) AS sum_norm,
           |  MAX(norm_r) AS max_norm, MIN(norm_r) AS min_norm
           |FROM (
           |  SELECT label, len(embedding) AS dim,
           |    round(sqrt(list_sum(list_transform(embedding,
           |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS norm_r
           |  FROM embeddings) t
           |GROUP BY label""".stripMargin)
  )

  private val LshPlanes = 8
  private val LshBandsCos = 2

  /** Random-hyperplane LSH cosine ANN — the scale path for q32.
    * 16 deterministic pseudo-random hyperplanes (components derived from
    * xxhash64(plane:dim)) → sign bits → 2 bands of 8 bits → bucket
    * groupBy → within-bucket pairs → exact cosine verify ≥ 0.99.
    * Candidate generation is one shuffle on (band, bucket).
    */
  val q34_lsh_cosine: GraftQuery = GraftQuery(
    "q34_lsh_cosine",
    (s, dir) => {
      val e = Tables.embWithNearDups(s, dir)
      val bits = e.withColumn("bits", expr(
        s"""transform(sequence(0, ${LshPlanes * LshBandsCos - 1}, 1), p ->
           |  if(aggregate(zip_with(embedding, sequence(0, size(embedding) - 1), (x, j) ->
           |       cast(x as double) * ((pmod(xxhash64(concat(cast(p as string), ':', cast(j as string))), 2001) - 1000) / 1000.0)),
           |     cast(0 as double), (acc, v) -> acc + v) > 0, 1, 0))""".stripMargin))
      val bands = bits.select(col("vec_id"),
        posexplode(expr(
          s"transform(sequence(0, ${LshBandsCos - 1}), b -> " +
            s"aggregate(slice(bits, b * $LshPlanes + 1, $LshPlanes), 0, (acc, x) -> acc * 2 + x))"))
          .as(Seq("band_id", "bucket")))
      val pairs = bands
        .groupBy(col("band_id"), col("bucket"))
        .agg(sort_array(collect_list(col("vec_id"))).as("ids"))
        .filter(size(col("ids")).between(2, MaxBucket))
        .select(explode(expr(pairExpr)).as("p"))
        .select(col("p.a_id"), col("p.b_id"))
        .distinct()
      pairs
        .join(e.select(col("vec_id").as("a_id"), col("embedding").as("q_emb")), "a_id")
        .join(e.select(col("vec_id").as("b_id"), col("embedding").as("n_emb")), "b_id")
        .withColumn("cosine",
          expr(dotExpr) / (expr(normExpr("q_emb")) * expr(normExpr("n_emb"))))
        .filter(col("cosine") >= 0.99)
        .select(col("a_id"), col("b_id"), round(col("cosine"), 6).as("cosine"))
    },
    None // LSH bucketing not SQL-expressible; recall vs q32 covered by SimilaritySpec
  )

  /** Multimodal column plumbing: documents carry an opaque `binary`
    * payload (here: utf-8 bytes standing in for image bytes) plus typed
    * metadata. The "decode" is a DETERMINISTIC FAKE (crc32/xxhash64 of
    * the payload → width/height/features) — the real decoder is the
    * swap-in point at the marked expression — but the Spark-side shape
    * is real: binary column, per-row feature vector, per-source rollup.
    */
  val q35_multimodal: GraftQuery = GraftQuery(
    "q35_multimodal",
    (s, dir) =>
      Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          col("text").cast("binary").as("payload"))
        // --- fake decode starts here: replace with a real image decoder ---
        .withColumn("n_bytes", expr("octet_length(payload)"))
        .withColumn("width", (crc32(col("payload")) % 640 + 16).cast("int"))
        .withColumn("height", (abs(xxhash64(col("payload"))) % 480 + 16).cast("int"))
        .withColumn("features", expr(
          "transform(sequence(0, 7), i -> " +
            "pmod(xxhash64(concat(cast(payload as string), ':', cast(i as string))), 1000))"))
        // --- fake decode ends ---
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_images"),
          sum(col("n_bytes")).cast("bigint").as("total_bytes"),
          sum(col("width")).cast("bigint").as("sum_width"),
          sum(col("height")).cast("bigint").as("sum_height"),
          sum(expr("aggregate(features, cast(0 as bigint), (acc, v) -> acc + v)"))
            .cast("bigint").as("sum_features")),
    None // crc32/xxhash64 fake-decode has no DuckDB equivalent; covered by SimilaritySpec
  )

  val all: Seq[GraftQuery] = Seq(
    q30_minhash_lsh, q31_simhash, q32_cosine_topk, q33_embed_stats,
    q34_lsh_cosine, q35_multimodal)
}
