package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed multimodal batch plumbing — the Scala counterpart of a
  * `mapInPandas` decode stage: opaque binary payloads flow through a
  * `mapPartitions` that processes records in BATCHES (the shape a real
  * vectorized decoder — JNI image lib, ONNX runtime, ffmpeg — wants),
  * emitting typed feature rows.
  *
  * The DECODE ITSELF IS A DETERMINISTIC STUB (`decodeBatch` marks the
  * swap-in point; this container has no image/audio libraries). What is
  * real, and tested: the schema, the Encoder round-trip, the batch
  * accumulation shape, partition-preserving execution, and the
  * downstream aggregation — i.e., all the Spark-side plumbing a real
  * decoder would drop into.
  */
object MultimodalPipeline {

  /** An opaque media record: bytes + typed metadata. */
  final case class MediaRecord(
      media_id: Long, source: String, kind: String, payload: Array[Byte])

  /** Decoded per-record features. */
  final case class MediaFeatures(
      media_id: Long, source: String, kind: String,
      n_bytes: Int, width: Int, height: Int, embedding: Array[Float])

  /** How many records a decoder call receives at once (the analogue of
    * the Arrow batch size in mapInPandas).
    */
  val BatchSize = 64

  // ----------------------------------------------------------------
  // REAL DECODER GOES HERE. The stub derives deterministic pseudo
  // metadata/embeddings from the payload bytes so tests can assert
  // exact round-trips.
  private[graft] def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      var h = 1125899906842597L // deterministic FNV-ish fold of the bytes
      var i = 0
      while (i < r.payload.length) { h = h * 31 + r.payload(i); i += 1 }
      val emb = Array.tabulate(8)(j => (((h >>> (j * 8)) & 0xff).toFloat) / 255f)
      MediaFeatures(r.media_id, r.source, r.kind, r.payload.length,
        ((h & 0x1ff) + 16).toInt, (((h >>> 9) & 0x1ff) + 16).toInt, emb)
    }
  // ----------------------------------------------------------------

  /** Decode a dataset of media records batch-wise within each
    * partition: no shuffle, no driver involvement, bounded memory
    * (one batch of payloads at a time per task).
    */
  def decode(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(b => decodeBatch(b.toSeq))
    }
  }

  /** Build media records from the documents table (text bytes stand in
    * for image bytes; kind cycles by doc_id so all three kinds appear).
    * Null-text rows are dropped — a null payload would NPE inside the
    * decoder, and a media record without bytes has nothing to decode.
    */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs
      .filter(col("text").isNotNull)
      .select(
      col("doc_id").as("media_id"),
      col("source"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** Per-(source, kind) feature rollup — the downstream consumer shape
    * (norm from the embedding via a fold, dims aggregated exactly).
    */
  def summarize(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF()
      .withColumn("emb_norm_r", round(sqrt(expr(
        "aggregate(embedding, cast(0 as double), (acc, x) -> acc + cast(x as double) * cast(x as double))")), 4))
      .groupBy(col("source"), col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).cast("bigint").as("total_bytes"),
        sum(col("width")).cast("bigint").as("sum_width"),
        sum(col("height")).cast("bigint").as("sum_height"),
        sum(col("emb_norm_r").cast("decimal(20,4)")).cast("double").as("sum_emb_norm"))
}
