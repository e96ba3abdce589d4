package graft

import graft.streaming.StreamOps
import graft.streaming.StreamOps.EvIn
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("s01 windowed counts over a MemoryStream match the batch transform") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = StreamOps.windowedCounts(df, watermark = false)
      .writeStream.format("memory").queryName("s01_out")
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData(
        (ts(1), "click", 1.5), (ts(4), "click", 2.0),
        (ts(7), "view", 1.0), (ts(13), "click", 4.0))
      q.processAllAvailable()
      val rows = spark.table("s01_out").collect()
        .map(r => (r.getAs[String]("window_start"), r.getAs[String]("event_type"),
          r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
      assert(rows == Set(
        ("2024-01-01 10:00:00", "click", 2L, 3.5),
        ("2024-01-01 10:00:00", "view", 1L, 1.0),
        ("2024-01-01 10:10:00", "click", 1L, 4.0)))
    } finally q.stop()
  }

  test("s02 stateful sessionization closes sessions across micro-batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[EvIn]
    val q = StreamOps.sessionize(mem.toDS(), emitTrailing = false)
      .writeStream.format("memory").queryName("s02_out")
      .outputMode(OutputMode.Append).start()
    def us(minute: Int): Long = ts(minute).getTime * 1000L
    try {
      mem.addData(EvIn(7L, us(0), 1L), EvIn(7L, us(10), 2L))
      q.processAllAvailable()
      assert(spark.table("s02_out").count() == 0, "open session must stay in state")
      // 100 min later: the 30-min gap closes the first session
      mem.addData(EvIn(7L, us(100) + 60L * 1000000 * 40, 3L))
      q.processAllAvailable()
      val rows = spark.table("s02_out").collect()
      assert(rows.length == 1)
      val r = rows.head
      assert(r.getAs[Long]("user_id") == 7L)
      assert(r.getAs[Long]("session_start_us") == us(0))
      assert(r.getAs[Long]("session_end_us") == us(10))
      assert(r.getAs[Long]("n_events") == 2L)
    } finally q.stop()
  }

  test("s01 watermark finalizes windows and discards late events (append mode)") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = StreamOps.windowedCounts(df, watermark = true)
      .writeStream.format("memory").queryName("s01_late")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((ts(1), "click", 1.0), (ts(5), "click", 2.0))
      q.processAllAvailable()
      assert(spark.table("s01_late").count() == 0, "open window must not emit in append mode")
      // event at 10:30 -> watermark 10:20 -> the 10:00 window finalizes
      mem.addData((ts(30), "click", 9.0))
      q.processAllAvailable()
      val emitted = spark.table("s01_late").collect()
        .map(r => (r.getAs[String]("window_start"), r.getAs[Long]("n_events"))).toSet
      assert(emitted == Set(("2024-01-01 10:00:00", 2L)))
      // a straggler for the finalized window arrives beyond the watermark
      mem.addData((ts(2), "click", 100.0))
      q.processAllAvailable()
      assert(spark.table("s01_late").count() == 1, "late event must be dropped, not re-emitted")
    } finally q.stop()
  }

  test("s04 stream-static enrichment over a MemoryStream matches the batch join") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val customers = Tables.table(spark, sfDir, "customer")
    val mem = MemoryStream[(Long, Double)]
    val df = mem.toDF().toDF("user_id", "value")
    val q = StreamOps.enrich(df, customers)
      .writeStream.format("memory").queryName("s04_out")
      .outputMode(OutputMode.Complete).start()
    try {
      // user 0 -> custkey 1, user 99 -> custkey 100 (deterministic map)
      mem.addData((0L, 1.5), (99L, 2.0), (0L, 3.0))
      q.processAllAvailable()
      val got = spark.table("s04_out").collect()
        .map(r => r.getAs[Int]("c_nationkey") -> (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toMap
      val want = StreamOps.enrich(
        Seq((0L, 1.5), (99L, 2.0), (0L, 3.0)).toDF("user_id", "value"), customers)
        .collect()
        .map(r => r.getAs[Int]("c_nationkey") -> (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toMap
      assert(got == want && got.values.map(_._1).sum == 3L)
    } finally q.stop()
  }

  test("s05 streaming near-dup finds cross-batch pairs and matches the batch form") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import StreamOps.ChunkDoc
    // hand-built signatures: docs 1 and 2 differ in 2 bits (near-dup,
    // share chunks 1-3), doc 3 is far from both
    def chunksOf(id: Long, sig: Long): Seq[ChunkDoc] =
      (0 until 4).map(i => ChunkDoc(i, (sig >>> (i * 16)) & 0xFFFFL, id, sig))
    val sigA = 0x0123456789ABCDEFL
    val sigB = sigA ^ 0x3L // hamming 2, same chunks 1..3
    val sigC = -1L
    val mem = MemoryStream[ChunkDoc]
    val q = StreamOps.nearDupPairs(mem.toDS())
      .writeStream.format("memory").queryName("s05_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(chunksOf(1L, sigA) ++ chunksOf(3L, sigC): _*)
      q.processAllAvailable()
      assert(spark.table("s05_out").count() == 0, "no near-dups yet")
      // doc 2 arrives LATER — must pair with doc 1 already in state
      mem.addData(chunksOf(2L, sigB): _*)
      q.processAllAvailable()
      val got = spark.table("s05_out").collect()
        .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
          r.getAs[Int]("hamming"))).toSet
      assert(got == Set((1L, 2L, 2)), s"got $got")
    } finally q.stop()
  }

  test("s06 stream-stream join attributes cross-batch pairs and expires old clicks") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val q = StreamOps.attributePurchases(
      clicks.toDF().toDF("ts", "user_id", "event_id"),
      purchases.toDF().toDF("ts", "user_id", "event_id"),
      streaming = true)
      .writeStream.format("memory").queryName("s06_out")
      .outputMode(OutputMode.Append).start()
    def pairs() = spark.table("s06_out").collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("click_id"),
        r.getAs[Long]("lag_us"))).toSet
    try {
      // click arrives FIRST, purchase in a LATER micro-batch: the join
      // must buffer the click in state until its purchase shows up
      clicks.addData((ts(0), 7L, 100L), (ts(1), 8L, 101L))
      q.processAllAvailable()
      assert(pairs().isEmpty, "no purchases yet")
      purchases.addData((ts(30), 7L, 200L))
      q.processAllAvailable()
      assert(pairs() == Set((200L, 100L, 30L * 60 * 1000000)),
        "cross-batch attribution within the window, same user only")
      // a purchase far past the window + watermark: the old clicks are
      // beyond attribution range, so nothing new joins — and both
      // watermarks having advanced, their state is expirable
      purchases.addData((Timestamp.valueOf("2024-01-02 10:00:00"), 7L, 201L))
      q.processAllAvailable()
      assert(pairs().size == 1, "out-of-window purchase attributes nothing")
    } finally q.stop()
  }

  test("s06 batch form matches an independently computed attribution set") {
    import spark.implicits._
    val e = Tables.table(spark, sfDir, "events")
    val got = graft.operators.StreamingBatchOps.s06_stream_join
      .run(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("click_id"))).toSet
    // driver-side reference over the same (small) fixture slice
    val evs = e.select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val want = (for {
      (pid, pu, pt, pus) <- evs if pt == "purchase"
      (cid, cu, ct, cus) <- evs
      if ct == "click" && cu == pu && cus <= pus && cus >= pus - 2L * 3600 * 1000000
    } yield (pid, cid)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("s05 batch form equals q31's brute-force pair set") {
    val got = graft.operators.StreamingBatchOps.s05_stream_neardup
      .run(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Int]("hamming"))).toSet
    val want = graft.operators.SimilarityOps.q31_simhash.run(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Int]("hamming"))).toSet
    assert(got.nonEmpty && got == want)
  }

  test("the classifier gate's batched inference runs unchanged over a stream") {
    // q57's scoring pass is partition-preserving map work, so the SAME
    // InferenceOps.score runs over readStream micro-batches with no
    // state store — the streaming curation gate is the batch code
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import graft.operators.InferenceOps
    import graft.operators.InferenceOps.DocFeatures
    val mem = MemoryStream[DocFeatures]
    val q = InferenceOps.score(mem.toDS())
      .writeStream.format("memory").queryName("s_cls_out")
      .outputMode(OutputMode.Append).start()
    val fs = (1 to 150).map(i =>
      DocFeatures(i.toLong, n_tokens = i % 50, n_chars = i * 7 % 211, stop_hits = i % 5))
    try {
      mem.addData(fs.take(70): _*)
      q.processAllAvailable()
      mem.addData(fs.drop(70): _*) // a second micro-batch scores independently
      q.processAllAvailable()
      val got = spark.table("s_cls_out").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"), r.getAs[Int]("keep")))
        .sortBy(_._1).toSeq
      val want = InferenceOps.score(fs.toDS()).collect()
        .map(s => (s.doc_id, s.score, s.keep)).sortBy(_._1).toSeq
      assert(got == want, "streamed scores must equal the batch pass")
    } finally q.stop()
  }

  test("s02 batch form equals the window-function sessionization") {
    import spark.implicits._
    val evs = Tables.table(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .as[EvIn]
    val typed = StreamOps.sessionize(evs, emitTrailing = true)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
    val viaWindows = graft.operators.LinkOps.q16_sessionize.run(spark, sfDir)
      .select(col("user_id"), col("n_sessions").as("expect"))
    val joined = typed.join(viaWindows, "user_id")
    assert(joined.count() > 0)
    assert(joined.filter(col("n_sessions") =!= col("expect")).count() == 0)
  }

  test("s08 sliding-window trending over a MemoryStream matches the batch rank") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF().toDF("ts", "event_type")
    val q = StreamOps.trendingCounts(df, watermark = false)
      .writeStream.format("memory").queryName("s08_out")
      .outputMode(OutputMode.Complete).start()
    try {
      // batch 1: clicks dominate the 10:00 windows
      mem.addData((ts(1), "click"), (ts(2), "click"), (ts(3), "view"))
      q.processAllAvailable()
      // batch 2: views take over in the 10:05–10:15 span — the rank
      // must flip per window, and every event sits in TWO windows
      mem.addData((ts(7), "view"), (ts(8), "view"), (ts(9), "view"), (ts(8), "click"))
      q.processAllAvailable()
      val counts = spark.table("s08_out")
      // each event contributes to exactly 2 sliding windows
      assert(counts.agg(sum(col("n_events"))).head().getLong(0) == 14L)
      val got = StreamOps.trendingTopK(counts).collect()
        .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n_events"))).toSet
      // the same events through the registered batch form
      val batch = StreamOps.trendingTopK(StreamOps.trendingCounts(
        Seq((ts(1), "click"), (ts(2), "click"), (ts(3), "view"),
          (ts(7), "view"), (ts(8), "view"), (ts(9), "view"), (ts(8), "click"))
          .toDF("ts", "event_type"), watermark = false)).collect()
        .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n_events"))).toSet
      assert(got == batch, "streamed trending must equal the batch form")
      // rank flip: click leads the window starting 09:55, view the 10:05 one
      def top(w: String) = got.filter(_._1 == w).maxBy(t => (t._3, t._2))._2
      assert(top("2024-01-01 09:55:00") == "click")
      assert(top("2024-01-01 10:05:00") == "view")
    } finally q.stop()
  }
}
