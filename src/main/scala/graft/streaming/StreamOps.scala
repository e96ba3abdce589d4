package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** §2D — Structured Streaming operators.
  *
  * Both transforms are input-agnostic: applied to a `readStream` source
  * they run incrementally (watermark/state), applied to a batch
  * DataFrame they produce the identical result, which is what the
  * DuckDB oracle checks (SparkEntry registers the batch form as
  * s01/s02). StreamingSpec drives the streaming form via MemoryStream.
  */
object StreamOps {

  /** Event for the typed sessionization path; `us` = event-time in
    * epoch micros (integer — see Tables.table for why not double math).
    */
  final case class EvIn(user_id: Long, us: Long, event_id: Long)

  final case class SessionRow(
      user_id: Long, session_start_us: Long, session_end_us: Long, n_events: Long)

  final case class SessState(pending: List[(Long, Long)])

  /** s01: watermarked tumbling-window counts per event type. On a
    * streaming input the watermark bounds state; on batch it is a no-op.
    * One shuffle (window, event_type); map-side partial agg applies.
    */
  def windowedCounts(events: DataFrame, watermark: Boolean): DataFrame = {
    val src = if (watermark) events.withWatermark("ts", "10 minutes") else events
    src
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        expr("ROUND(CAST(SUM(CAST(value AS DECIMAL(25,10))) AS DOUBLE), 6)").as("sum_value"))
      .select(col("w.start").cast("string").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
  }

  /** s08 stage 1: SLIDING-window (10 min window / 5 min slide) counts
    * per event type — each event lands in exactly two windows. On a
    * streaming input the watermark bounds the open-window state; on
    * batch it is a no-op. Still one shuffle: the slide multiplies rows
    * row-locally (explode of the two window assignments) before the
    * map-side partial agg.
    */
  def trendingCounts(events: DataFrame, watermark: Boolean): DataFrame = {
    val src = if (watermark) events.withWatermark("ts", "10 minutes") else events
    src
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").cast("string").as("window_start"),
        col("event_type"), col("n_events"))
  }

  /** s08 stage 2: the per-window top-k rank over the (already tiny)
    * counts frame — the "trending now" serving projection. Runs through
    * the bounded-heap TopKPerGroup operator; ties break on event_type
    * so the result set is deterministic. In the streaming deployment
    * this ranks each micro-batch's closed windows (foreachBatch); the
    * registered batch form ranks the whole history.
    */
  def trendingTopK(counts: DataFrame, k: Int = 3): DataFrame =
    graft.plans.TopKPerGroup(counts, Seq(col("window_start")),
      Seq(col("n_events").desc, col("event_type").asc), k)

  /** s03: streaming exact dedup. On a stream, state is bounded by the
    * watermark (`dropDuplicatesWithinWatermark`: a duplicate arriving
    * within the watermark horizon is dropped, state beyond it expires —
    * THE way to dedup an unbounded stream with finite memory); on
    * batch, plain dropDuplicates gives the identical result set.
    */
  def dedupEvents(events: DataFrame, streaming: Boolean): DataFrame = {
    val deduped =
      if (streaming)
        events.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark("event_id")
      else events.dropDuplicates("event_id")
    deduped.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_unique_events"))
  }

  /** s04: stream-static enrichment — the dimension join every event
    * pipeline needs (events arrive on the stream, reference data sits
    * in a table). The static side joins per micro-batch with a
    * broadcast hash join — no stream-side state at all (unlike
    * stream-stream joins), so it scales with the dim size, not the
    * stream history. `user_id % 100 + 1` maps onto customer keys
    * deterministically so the batch oracle reproduces the join total.
    */
  def enrich(events: DataFrame, customers: DataFrame): DataFrame = {
    val dim = customers.select(col("c_custkey"), col("c_nationkey"))
    events
      .join(broadcast(dim), pmod(col("user_id"), lit(100)) + 1 === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(
        count(lit(1)).as("n_events"),
        expr("ROUND(CAST(SUM(CAST(value AS DECIMAL(25,10))) AS DOUBLE), 6)").as("sum_value"))
  }

  /** One SimHash two-level pigeonhole key of one document (16 per doc). */
  final case class ChunkDoc(chunk_id: Int, chunk_val: Long, doc_id: Long, sig: Long)

  final case class NearDupPair(a_id: Long, b_id: Long, hamming: Int)

  final case class BucketState(docs: List[(Long, Long)])

  /** Per-bucket cap — THE SAME constant as the batch family's
    * hot-bucket guard (one definition, no drift). Semantics
    * necessarily differ from q31's at the cap: a batch job sees the
    * whole bucket and can DROP it, but a stream cannot retract pairs
    * already emitted — so a hot bucket stops ACCUMULATING state
    * (existing members still match) instead. Below the cap the two
    * are identical; see the equivalence note on [[nearDupPairs]].
    */
  private val MaxBucketState = graft.operators.SimilarityOps.MaxBucket

  /** s05: STREAMING near-dup detection — the incremental-dedup shape
    * (q60) running continuously: documents arrive keyed by their
    * SimHash two-level pigeonhole (16 28-bit keys per doc — see
    * SimHashSig.pigeonholeChunks for the hamming≤3 losslessness
    * argument), each (chunk_id, chunk_val) bucket keeps its members
    * in `flatMapGroupsWithState` state, and an arriving doc emits a
    * pair for every state member within hamming ≤ 3. The pigeonhole
    * guarantees any qualifying pair shares at least one of its 16
    * keys, so whichever doc arrives later emits it — WHILE EVERY
    * BUCKET STAYS UNDER [[MaxBucketState]], the accumulated output
    * over any prefix of the stream is EXACTLY the batch (q31) pair
    * set over the same docs (modulo cross-key repeats: a close pair
    * can share several of its 16 keys — dedup downstream). Each doc
    * contributes one state row to each of its 16 buckets, so
    * per-doc state is 16 × (doc_id, sig) — the per-BUCKET bound
    * below is what caps the hot-key risk.
    * At the cap the two diverge BY DESIGN: q31 drops the whole hot
    * bucket, but a stream cannot retract emitted pairs, so this side
    * keeps matching against the first [[MaxBucketState]] accumulated
    * members and only stops growing state. State per key is a bounded
    * list; on batch input the same code runs with empty initial
    * state, which is what the DuckDB brute-force oracle certifies
    * (the fixture stays far below the cap).
    */
  def nearDupPairs(chunks: Dataset[ChunkDoc]): Dataset[NearDupPair] = {
    import chunks.sparkSession.implicits._
    chunks
      .groupByKey(c => (c.chunk_id, c.chunk_val))
      .flatMapGroupsWithState[BucketState, NearDupPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, it, state) =>
          var seen = if (state.exists) state.get.docs else Nil
          val out = List.newBuilder[NearDupPair]
          // deterministic intra-batch order (iterator order is not)
          it.toSeq.sortBy(_.doc_id).foreach { c =>
            seen.foreach { case (id, sg) =>
              if (id != c.doc_id) {
                val h = java.lang.Long.bitCount(sg ^ c.sig)
                if (h <= 3)
                  out += NearDupPair(math.min(id, c.doc_id), math.max(id, c.doc_id), h)
              }
            }
            if (seen.size < MaxBucketState) seen = (c.doc_id, c.sig) :: seen
          }
          state.update(BucketState(seen))
          out.result().iterator
      }
  }

  /** Attribution lookback — clicks this far before a purchase count. */
  val AttributionWindow = "2 hours"

  /** s06: STREAM-STREAM event-time join — purchase→click attribution,
    * the canonical two-stream correlation (ad impressions ⨝ conversions
    * at industrial scale). Each purchase joins the SAME user's clicks
    * in the preceding [[AttributionWindow]].
    *
    * Streaming: both sides carry watermarks and the join condition
    * bounds event-time distance, which is exactly what Structured
    * Streaming needs to EXPIRE join state — a click older than
    * watermark + window can never match a future purchase and is
    * dropped from the buffer, so state is bounded by (event rate ×
    * window), not stream history. Without the time bound the click
    * buffer would grow forever; this is the stream-stream analogue of
    * the hot-bucket guard. On batch inputs the identical plan is a
    * plain range join, which the DuckDB oracle certifies.
    *
    * Output carries integer epoch-micros lag (exact cross-engine; the
    * q33/q61 "ints, not float seconds" rule), one row per attributed
    * (purchase, click) pair — inner join, so append mode streams it.
    */
  def attributePurchases(clicks: DataFrame, purchases: DataFrame,
      streaming: Boolean): DataFrame = {
    val c0 = clicks.select(col("user_id").as("c_user"),
      col("event_id").as("click_id"), col("ts").as("c_ts"))
    val p0 = purchases.select(col("user_id").as("p_user"),
      col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    // watermark delay > window: a click still joinable against an
    // in-watermark purchase must itself still be buffered
    val (c, p) =
      if (streaming) (c0.withWatermark("c_ts", "3 hours"),
        p0.withWatermark("p_ts", "3 hours"))
      else (c0, p0)
    p.join(c, expr("p_user = c_user" +
        s" AND c_ts >= p_ts - INTERVAL $AttributionWindow AND c_ts <= p_ts"))
      .select(col("purchase_id"), col("click_id"),
        col("p_user").as("user_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("lag_us"))
  }

  private val GapUs: Long = 30L * 60 * 1000 * 1000

  /** Split events (sorted by (us, event_id)) into gap-delimited sessions. */
  private def splitSessions(evs: List[(Long, Long)]): List[List[(Long, Long)]] =
    evs.foldLeft(List.empty[List[(Long, Long)]]) {
      case (acc, e) if acc.nonEmpty && e._1 - acc.head.head._1 <= GapUs =>
        (e :: acc.head) :: acc.tail // sessions kept newest-first
      case (acc, e) => List(e) :: acc
    }.map(_.reverse).reverse

  /** s02: gap-based (30 min) sessionization via flatMapGroupsWithState.
    *
    * Streaming: closed sessions (a newer event proves the gap) emit as
    * soon as they close; the trailing open session stays in state.
    * Batch (`emitTrailing = true`): everything emits, matching the SQL
    * gap-sessionization oracle exactly.
    */
  def sessionize(events: Dataset[EvIn], emitTrailing: Boolean): Dataset[SessionRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[EvIn], state: GroupState[SessState]) =>
          val prior = if (state.exists) state.get.pending else Nil
          val evs = (prior ++ it.map(e => (e.us, e.event_id)))
            .sortBy(identity)
          val sessions = splitSessions(evs)
          val (emit, keep) =
            if (emitTrailing || sessions.isEmpty) (sessions, Nil)
            else (sessions.init, sessions.last)
          if (emitTrailing || keep.isEmpty) state.remove()
          else state.update(SessState(keep))
          emit.iterator.map { sess =>
            SessionRow(uid, sess.head._1, sess.last._1, sess.size.toLong)
          }
      }
  }

  /** s07: STREAMING corpus delivery — the JsonlSink contract applied
    * incrementally. Each micro-batch lands under a batch-scoped dir
    * (`<path>/batch=<id>/shard=<k>/part-*.json.gz`):
    *
    *   - **Exactly-once by idempotent naming**: a batch retried after
    *     a crash overwrites `batch=<id>` wholesale instead of
    *     appending duplicates — the standard foreachBatch replay
    *     discipline (batch ids are stable across restarts from the
    *     checkpoint).
    *   - **Deterministic shard membership**: the shard column is
    *     xxhash64(doc_id) mod n — a doc's shard never depends on
    *     which micro-batch carried it, so a loader that consumes
    *     `⋃ batch=∗/shard=K` sees exactly the batch-agnostic shard K
    *     of the full corpus ([[graft.sinks.JsonlSink.write]] semantics;
    *     StreamExportSpec pins stream ≡ batch equality).
    *
    * At 100 TB this is the delivery tail of a continuously-ingesting
    * curation pipeline: shard count bounds per-file size per batch,
    * and no state accumulates across batches (the sink is stateless —
    * all exactly-once bookkeeping is the checkpoint's offset log).
    */
  /** Default shard count for s07's registered batch form — small
    * enough that sf0.01's 500 docs land ≥ tens per shard, the shape a
    * loader expects; production sizes shards from corpus volume
    * (Pipeline.exportCorpus derives it from docsPerShard).
    */
  val ExportShards = 8

  def exportStream(docs: DataFrame, path: String, shards: Int,
      shardKey: String = "doc_id",
      compression: String = "gzip"): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", s"$path/_checkpoint")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.sinks.JsonlSink.write(batch.toDF(), s"$path/batch=$id",
          shards, shardKey, compression)
      }
      .start()
}
