package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** §2C (continued) — the model-scoring pass of a training-data
  * pipeline: every corpus is gated by a learned quality classifier
  * (fastText-style) before training, and on a cluster that pass is
  * BATCHED INFERENCE inside the executors — a model session per task,
  * records fed in fixed-size batches, no shuffle, no driver.
  *
  * Like the multimodal decode (MultimodalPipeline), the MODEL here is
  * a deterministic stand-in (this container ships no inference
  * runtime) — an integer-weight linear scorer whose arithmetic is
  * exact, so the full pass carries a hash-exact DuckDB oracle. What is
  * real, and what the oracle + spec pin: the feature extraction, the
  * Dataset/Encoder round-trip, the batch accumulation shape
  * (`grouped(BatchSize)` per partition — the Arrow-batch analogue),
  * partition-preserving execution, and the keep/drop gate downstream
  * pipelines consume.
  */
object InferenceOps {

  /** Per-doc features the "model" consumes (all exact integers). */
  final case class DocFeatures(
      doc_id: Long, n_tokens: Int, n_chars: Int, stop_hits: Int)

  /** Scored output row. */
  final case class DocScore(doc_id: Long, score: Double, keep: Int)

  /** Batch size per model call — the Arrow-batch analogue. */
  val BatchSize = 64

  // ----------------------------------------------------------------
  // REAL MODEL GOES HERE (ONNX session, JNI fastText, …): one call
  // per batch, executor-side. The stand-in is an integer linear
  // scorer squashed by the RATIONAL s/(1+|s|) (not a logistic —
  // exp() is not bit-identical across engines, integer ratios are),
  // so the DuckDB oracle reproduces every double exactly.
  private[graft] def scoreBatch(batch: Seq[DocFeatures]): Seq[DocScore] =
    batch.map { f =>
      val s = 3L * f.n_tokens - f.n_chars + 40L * f.stop_hits - 25L
      DocScore(f.doc_id, s.toDouble / (1L + math.abs(s)).toDouble,
        if (s > 0L) 1 else 0)
    }
  // ----------------------------------------------------------------

  /** Score a features dataset batch-wise within each partition: no
    * shuffle, bounded memory (one batch per task at a time).
    */
  def score(features: Dataset[DocFeatures]): Dataset[DocScore] = {
    import features.sparkSession.implicits._
    features.mapPartitions(_.grouped(BatchSize).flatMap(scoreBatch))
  }

  /** Classifier quality gate over `documents`: columnar feature
    * extraction → batched executor-side scoring → keep/drop verdicts.
    * The only shuffle in the whole pass is whatever the SOURCE scan
    * needs — scoring is partition-preserving map work, which is the
    * property that matters at 100 TB (the corpus streams through the
    * model exactly once, co-partitioned with its input).
    */
  /** The full scoring pass (feature extraction → batched inference) as
    * a reusable frame: q57 exposes it raw, q58 samples from it.
    */
  private[graft] def scoredDocs(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    scoredFrame(Tables.table(s, dir, "documents"))

  /** The same scoring pass over any documents frame — the classifier
    * gate Pipeline.exportCorpus applies (`keep = 1`).
    */
  private[graft] def scoredFrame(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val features = docs
      .select(col("doc_id"),
        (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1)
          .cast("int").as("n_tokens"),
        length(col("text")).cast("int").as("n_chars"),
        expr("CAST(size(filter(split(text, ' '), w -> w = 'the' OR w = 'a')) AS INT)")
          .as("stop_hits"))
      .as[DocFeatures]
    score(features).toDF()
  }

  val q57_classifier_filter: GraftQuery = GraftQuery(
    "q57_classifier_filter",
    (s, dir) => scoredDocs(s, dir),
    Some("""SELECT doc_id,
           |  CAST(s AS DOUBLE) / CAST(1 + ABS(s) AS DOUBLE) AS score,
           |  CASE WHEN s > 0 THEN 1 ELSE 0 END AS keep
           |FROM (
           |  SELECT doc_id,
           |    3 * (length(text) - length(replace(text, ' ', '')) + 1)
           |      - length(text)
           |      + 40 * len(list_filter(string_split(text, ' '), w -> w = 'the' OR w = 'a'))
           |      - 25 AS s
           |  FROM documents) t""".stripMargin)
  )

  /** Classifier-scored stratified sampling — the step after the gate:
    * bucket the corpus into quality STRATA by classifier score, then
    * draw a deterministic per-stratum sample with quality-weighted
    * caps (better strata keep more). This is how a curated training
    * mix is actually drawn — sample within quality bands, not
    * uniformly — and the whole pass is ONE corpus scan: scoring is
    * partition-preserving map work, and the bounded-heap TopKPerGroup
    * moves at most `maxCap` rows per stratum per partition through the
    * single shuffle (no window sort, no full-corpus exchange).
    *
    * Scores and boundaries are exact doubles (the rational squash),
    * and the in-stratum order is the same md5 draw as q45, so the full
    * sample carries a hash-exact DuckDB oracle.
    */
  /** Strata config: `boundaries` are DESCENDING score cut points,
    * `caps(i)` is the sample cap for stratum `i` — stratum ids run
    * `boundaries.length` (best, score >= boundaries.head) down to `0`
    * (worst, below every boundary), so `caps.length ==
    * boundaries.length + 1`. Swapping the model (a real fastText /
    * ONNX session in [[scoreBatch]]) or re-tuning the curation mix
    * changes ONE call site — the plan shape (single corpus scan,
    * bounded-heap TopKPerGroup) is invariant to the config.
    */
  def classifierStrata(s: org.apache.spark.sql.SparkSession, dir: String,
      boundaries: Seq[Double], caps: Seq[Int]): org.apache.spark.sql.DataFrame = {
    require(boundaries.nonEmpty && caps.length == boundaries.length + 1,
      s"need boundaries.length + 1 caps, got ${boundaries.length} boundaries / ${caps.length} caps")
    // STRICTLY descending — a duplicated boundary would silently make
    // one stratum unreachable and mis-align every cap below it
    require(boundaries.zip(boundaries.tail).forall { case (a, b) => a > b },
      s"boundaries must be strictly descending: $boundaries")
    val top = boundaries.length // best stratum id
    val strata = scoredDocs(s, dir)
      .withColumn("stratum",
        boundaries.zipWithIndex.tail.foldLeft(
          when(col("score") >= boundaries.head, top)) {
          case (c, (b, i)) => c.when(col("score") >= b, top - i)
        }.otherwise(0))
      .withColumn("rnd", md5(col("doc_id").cast("string")))
    val capCol = caps.zipWithIndex.tail.foldLeft(
      when(col("stratum") === 0, caps.head)) {
      case (c, (k, st)) => c.when(col("stratum") === st, k)
    }
    graft.plans.TopKPerGroup(strata,
      Seq(col("stratum")), Seq(col("rnd").asc, col("doc_id").asc), caps.max,
      rank = Some("rk"))
      .filter(col("rk") <= capCol)
      .select(col("stratum"), col("doc_id"), col("score"), col("rk"))
  }

  val q58_classifier_strata: GraftQuery =
    GraftQuery(
      "q58_classifier_strata",
      // caps are WORST-first (stratum 0 → 10 … stratum 3 → 40)
      (s, dir) => classifierStrata(s, dir,
        boundaries = Seq(0.5, 0.0, -0.5), caps = Seq(10, 20, 30, 40)),
      Some("""WITH scored AS (
             |  SELECT doc_id,
             |    CAST(s AS DOUBLE) / CAST(1 + ABS(s) AS DOUBLE) AS score
             |  FROM (
             |    SELECT doc_id,
             |      3 * (length(text) - length(replace(text, ' ', '')) + 1)
             |        - length(text)
             |        + 40 * len(list_filter(string_split(text, ' '), w -> w = 'the' OR w = 'a'))
             |        - 25 AS s
             |    FROM documents) t),
             |st AS (
             |  SELECT doc_id, score,
             |    CASE WHEN score >= 0.5 THEN 3 WHEN score >= 0.0 THEN 2
             |         WHEN score >= -0.5 THEN 1 ELSE 0 END AS stratum
             |  FROM scored)
             |SELECT stratum, doc_id, score, rk FROM (
             |  SELECT stratum, doc_id, score,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY stratum
             |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rk
             |  FROM st) r
             |WHERE rk <= CASE stratum WHEN 3 THEN 40 WHEN 2 THEN 30
             |                         WHEN 1 THEN 20 ELSE 10 END""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q57_classifier_filter, q58_classifier_strata)
}
