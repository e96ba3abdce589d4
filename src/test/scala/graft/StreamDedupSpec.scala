package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StreamDedupSpec extends SparkSpec {

  test("s03 drops duplicate event_ids arriving across micro-batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, Long, String)]
    val df = mem.toDF().toDF("ts", "event_id", "event_type")
    val q = StreamOps.dedupEvents(df, streaming = true)
      .writeStream.format("memory").queryName("s03_out")
      .outputMode(OutputMode.Complete).start()
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    try {
      mem.addData((ts(1), 1L, "click"), (ts(2), 2L, "click"), (ts(2), 2L, "click"))
      q.processAllAvailable()
      mem.addData((ts(3), 1L, "click"), (ts(4), 3L, "view")) // 1 is a dup from batch 1
      q.processAllAvailable()
      val counts = spark.table("s03_out").collect()
        .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_unique_events")).toMap
      assert(counts == Map("click" -> 2L, "view" -> 1L))
    } finally q.stop()
  }

  test("s03 batch form equals streaming semantics on the events table") {
    val batch = graft.operators.StreamingBatchOps.s03_stream_dedup.run(spark, sfDir)
    val total = batch.collect().map(_.getAs[Long]("n_unique_events")).sum
    assert(total == Tables.table(spark, sfDir, "events").count(),
      "dedup of events ∪ events must return each event once")
  }
}
