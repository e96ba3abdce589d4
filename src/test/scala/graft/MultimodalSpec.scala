package graft

import graft.multimodal.MultimodalPipeline
import graft.multimodal.MultimodalPipeline.{MediaFeatures, MediaRecord}

class MultimodalSpec extends SparkSpec {

  private lazy val records =
    MultimodalPipeline.fromDocuments(Tables.table(spark, sfDir, "documents"))

  test("typed decode preserves every record and round-trips the Encoder") {
    val feats = MultimodalPipeline.decode(records).collect()
    assert(feats.length == records.count())
    feats.foreach { f =>
      assert(f.n_bytes > 0 && f.width >= 16 && f.height >= 16)
      assert(f.embedding.length == 8)
      assert(f.embedding.forall(v => v >= 0f && v <= 1f))
    }
  }

  test("distributed decode equals a driver-side batch decode (same stub, same result)") {
    val local = records.collect().grouped(MultimodalPipeline.BatchSize)
      .flatMap(b => MultimodalPipeline.decodeBatch(b.toSeq)).toSeq
      .map(f => f.media_id -> f.embedding.toSeq).toMap
    val dist = MultimodalPipeline.decode(records.repartition(8)).collect()
      .map(f => f.media_id -> f.embedding.toSeq).toMap
    assert(dist == local, "partitioning/batch boundaries must not change decode output")
  }

  test("decode runs without a shuffle (mapPartitions stays in the scan stage)") {
    val plan = MultimodalPipeline.decode(records).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode must not shuffle:\n$plan")
  }

  test("summary rolls up per (source, kind) with exact sums") {
    val sum = MultimodalPipeline.summarize(MultimodalPipeline.decode(records)).collect()
    assert(sum.nonEmpty)
    val total = sum.map(_.getAs[Long]("n_media")).sum
    assert(total == records.count())
    assert(sum.map(_.getAs[String]("kind")).toSet == Set("image", "audio", "video"))
  }
}
