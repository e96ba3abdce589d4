package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._

/** §2C (continued) — corpus-curation operators added in round 8:
  * importance-resampling data selection (DSIR, Xie et al. 2023) and
  * line-level exact dedup (the RefinedWeb/MassiveText pass that q67's
  * rolling-window scrub deliberately does not cover: disjoint
  * line-granular removal with keep-first rebuild).
  */
object CurationOps {

  /** Hashed-feature bucket count for DSIR. Small on purpose: DSIR's
    * whole point is that hashing collapses the n-gram space into a
    * fixed-size table the driver can broadcast — the paper uses 10k
    * buckets for a trillion-token corpus; 256 keeps the fixture's
    * per-bucket counts dense while exercising the identical dataflow.
    */
  private val DsirBuckets = 256

  /** The "target distribution" sample: DSIR scores raw docs by how
    * much they look like a curated target corpus. Here the target is
    * two of the twenty synthetic sources (at 100 TB: Wikipedia +
    * books against a crawl).
    */
  private val DsirTarget = Seq("src0", "src1")

  private val DsirTopK = 100

  /** Word unigram + bigram feature array of `text` (DSIR's feature
    * set), ready for bucket-hashing. The `if` guards Spark's
    * `sequence(1, 0)`, which would COUNT DOWN rather than produce an
    * empty array.
    */
  private val DsirFeats =
    "concat(toks, if(size(toks) >= 2, " +
      "transform(sequence(1, size(toks) - 1), " +
      "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))), " +
      "cast(array() as array<string>)))"

  /** DSIR — Data Selection via Importance Resampling (Xie et al.
    * 2023): fit hashed-n-gram bag-of-words models of the TARGET and
    * RAW distributions, weight every raw doc by its log importance
    * ratio Σ_f [ln p̂_target(f) − ln p̂_raw(f)] (add-one smoothing over
    * the bucket table), and keep the top-k — the cheap,
    * embarrassingly-parallel alternative to classifier-based
    * selection (q57) that needs no trained model.
    *
    * Scale shape:
    *   - ONE corpus scan, total: the feature explode is bucket-hashed
    *     row-locally in the scan stage and collapses map-side into the
    *     per-(doc, bucket) count frame — the sufficient statistic for
    *     BOTH the fit and the scoring, capped at docs × `DsirBuckets`
    *     rows. The raw feature stream never reaches an exchange.
    *   - The fit is one aggregate over that frame (`DsirBuckets` rows
    *     out; target counts ride along as a conditional sum — the
    *     target is a column predicate, not a second table); the weight
    *     table broadcasts back and scoring is Σ_b cnt_b·w_b — exactly
    *     the per-feature sum, because DECIMAL arithmetic is exact.
    *   - Selection is a bounded `TakeOrderedAndProject` (top-k), never
    *     a full sort.
    *
    * Determinism: per-bucket weights round to 6 decimals, per-doc
    * scores sum as DECIMAL(20,6) (order-independent), ties break on
    * doc_id — hash-exact oracle.
    *
    * Reference analogue: none (the reference curates nothing); this is
    * pure training-data-pipeline surface, like q47/q64/q65.
    *
    * This is the fit + score over any (doc_id, source, text) frame:
    * (doc_id, source, dsir_logw, n_feats); highest-first selection is
    * the caller's `orderBy.limit`. `isTarget` defines the target
    * distribution as a row predicate (q76: two named sources;
    * Pipeline.exportCorpus: whatever the delivery recipe says).
    */
  /** Bucket hashes for [[dsirScores]]. `xxhashBucket` is the
    * PRODUCTION hash — codegen'd, one 64-bit mix per feature (~10×
    * cheaper than md5's cryptographic rounds, which DSIR does not
    * need: any well-mixed hash gives the same collision statistics).
    * `md5Bucket` is the cross-engine CONTRACT hash — the only hash
    * both Spark and DuckDB compute bit-identically — carried by
    * q76_verify so the feature-extraction + bucketing dataflow stays
    * pinned against an independent engine.
    */
  private[graft] def xxhashBucket(f: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(xxhash64(f), lit(DsirBuckets))

  private[graft] def md5Bucket(f: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(f), 1, 8), 16, 10).cast("bigint") % lit(DsirBuckets)

  private[graft] def dsirScores(docs: org.apache.spark.sql.DataFrame,
      isTarget: org.apache.spark.sql.Column,
      bucketOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column = xxhashBucket,
      dump: Option[String] = None): org.apache.spark.sql.DataFrame = {
      val fx = docs
        .select(col("doc_id"), col("source"), isTarget.as("is_target"),
          expr("regexp_extract_all(lower(text), '[a-z]+', 0)").as("toks"))
        .select(col("doc_id"), col("source"), col("is_target"),
          explode(expr(DsirFeats)).as("f"))
        .select(col("doc_id"), col("source"), col("is_target"),
          bucketOf(col("f")).as("b"))
      // ONE corpus scan: the per-(doc, bucket) count frame is the
      // sufficient statistic for BOTH the fit and the scoring
      // (score = Σ_b cnt_b · w_b, exactly the per-feature sum because
      // DECIMAL arithmetic is exact), so everything downstream runs on
      // a frame capped at docs × DsirBuckets rows — the feature stream
      // itself never reaches an exchange (map-side combine collapses
      // it inside the scan stage)
      val fb0 = fx.groupBy(col("doc_id"), col("source"), col("is_target"), col("b"))
        .agg(count(lit(1)).as("cnt"))
      // The FIT is a bounded model — ≤ DsirBuckets (raw, target) count
      // pairs (DSIR's design point: the paper's table is 10k entries
      // for a trillion-token corpus) — so it is derived DRIVER-SIDE
      // and shipped back into the scoring plan as a literal lookup
      // array: one codegen'd element_at per fb row instead of a
      // crossJoin job + a broadcast hash join. This is a bounded-model
      // collect, not a data collect — the corpus never leaves the
      // executors.
      //
      // With a dump path (q76's oracle input, Verify mode only) the
      // parquet write doubles as the checkpoint AND the fit rides the
      // write job itself via observe() + the fixed-width
      // BucketHistogram aggregate — the fb frame is computed exactly
      // once and scanned once more for scoring. Without a dump
      // (production bench path, Pipeline.exportCorpus, q76_verify) the
      // (doc,bucket) frame is never materialized at all — see the
      // None branch below.
      val (fb, rCounts, tCounts) = dump match {
        case Some(path) =>
          val obs = new org.apache.spark.sql.Observation()
          fx.sparkSession.sparkContext.setJobDescription("dsir fb dump + fit")
          // atomic swap (tmp write + rename): a concurrent DuckDB
          // reader of the dump never sees a half-written directory;
          // the observe()-riding fit fires on the tmp write job
          Tables.atomicParquetDump(
            fb0.observe(obs,
              graft.plans.BucketHistogram.of(
                col("b"), col("cnt"), col("is_target"), DsirBuckets).as("fit")),
            path)
          val flat = obs.get("fit").asInstanceOf[scala.collection.Seq[Long]].toArray
          (graft.Tables.readBack(fb0, path),
            flat.take(DsirBuckets), flat.drop(DsirBuckets))
        case None =>
          // production (no-dump) plan, r12: the fit needs only the 256
          // per-bucket TOTALS and the scoring tail only per-doc sums —
          // neither needs the docs×buckets frame, so skip fb0 entirely.
          // Fit = one tiny aggregate straight off the feature stream
          // (256 groups, map-side combined: the exchange moves ≤ 256
          // rows per task); scoring re-derives the feature stream with
          // cnt=1 (map-side combine collapses it to ~1 row per doc
          // before ITS exchange — exact DECIMAL sums are
          // grouping-invariant, so the output is bit-identical to the
          // fb spelling). Re-scanning the corpus once beats
          // materializing the 31.7M-row (doc,bucket) frame the old
          // localCheckpoint held (measured slower than the dump write
          // it replaced at sf10).
          val counts = fx.groupBy(col("b")).agg(
            count(lit(1)).as("r_cnt"),
            sum(when(col("is_target"), lit(1L)).otherwise(lit(0L))).as("t_cnt"))
            .collect()
          val (r, t) = (new Array[Long](DsirBuckets), new Array[Long](DsirBuckets))
          counts.foreach { row =>
            val b = row.getAs[Long]("b").toInt
            r(b) = row.getAs[Long]("r_cnt"); t(b) = row.getAs[Long]("t_cnt")
          }
          (fx.withColumn("cnt", lit(1L)), r, t)
      }
      val rr = rCounts.sum.toDouble
      val tt = tCounts.sum.toDouble
      // cross-engine note (q64's trade): JVM Math.log and DuckDB ln
      // are each ~1-ulp accurate but not identically rounded, so a
      // weight landing within ~1e-16 of a 0.5e-6 rounding boundary
      // COULD round apart (~1e-7 odds across 256 buckets). Accepted
      // for the hash-exact oracle like q61/q64; a flake here means
      // this, not a logic bug. (Driver-side Math.log IS the same JVM
      // intrinsic Spark's log() codegen calls, so collecting the fit
      // changes nothing cross-engine.)
      val wArr = Array.tabulate(DsirBuckets) { b =>
        if (rCounts(b) == 0L) 0.0 // bucket absent from fb: weight unused
        else {
          val w = math.log((tCounts(b) + 1.0) / (tt + DsirBuckets)) -
            math.log((rCounts(b) + 1.0) / (rr + DsirBuckets))
          // round() semantics: HALF_UP
          BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      }
      fb.withColumn("wt",
          element_at(typedLit(wArr.toSeq), col("b").cast("int") + 1))
        .groupBy(col("doc_id"), col("source"))
        .agg(
          round(sum((col("wt").cast("decimal(20,6)") * col("cnt")).cast("decimal(30,6)"))
            .cast("double"), 6).as("dsir_logw"),
          sum(col("cnt")).cast("int").as("n_feats"))
  }

  /** Dir-keyed dump of q76's per-(doc, bucket) count frame — the
    * oracle's input (the q30_verify pattern): DuckDB cannot compute
    * Spark's xxhash64, so the production query dumps the sufficient
    * statistic and the oracle re-derives EVERYTHING downstream of the
    * hash (fit, smoothing, weights, DECIMAL scoring, top-k) from it.
    * The hash step itself is pinned cross-engine by q76_verify's md5
    * contract.
    */
  private[graft] def q76BucketDump(dir: String): String =
    Tables.oracleDumpPath("q76_buckets", dir)

  val q76_dsir: GraftQuery = GraftQuery(
    "q76_dsir",
    (s, dir) =>
      dsirScores(Tables.table(s, dir, "documents"),
        col("source").isin(DsirTarget: _*),
        // the dump is ORACLE input, not a plan dependency: written only
        // in Verify mode so the bench measures the production plan (the
        // no-dump branch fits via the checkpoint-riding collect)
        dump = if (graft.GraftConf.oracleDumps) Some(q76BucketDump(dir)) else None)
        .orderBy(col("dsir_logw").desc, col("doc_id").asc)
        .limit(DsirTopK),
    Some(s"""WITH fb AS (
            |  SELECT doc_id, source, is_target, b, cnt
            |  FROM read_parquet('${q76BucketDump(Tables.VerifyDir)}/*.parquet')
            |), counts AS (
            |  SELECT b, CAST(SUM(cnt) AS DOUBLE) AS r_cnt,
            |    CAST(SUM(CASE WHEN is_target THEN cnt ELSE 0 END) AS DOUBLE) AS t_cnt
            |  FROM fb GROUP BY b
            |), tot AS (
            |  SELECT SUM(r_cnt) AS rr, SUM(t_cnt) AS tt FROM counts
            |), w AS (
            |  SELECT b, ROUND(
            |    ln((t_cnt + 1.0) / (tt + $DsirBuckets.0)) -
            |    ln((r_cnt + 1.0) / (rr + $DsirBuckets.0)), 6) AS wt
            |  FROM counts CROSS JOIN tot
            |)
            |SELECT doc_id, source,
            |  ROUND(CAST(SUM(CAST(wt AS DECIMAL(20,6)) * cnt) AS DOUBLE), 6) AS dsir_logw,
            |  CAST(SUM(cnt) AS INT) AS n_feats
            |FROM fb JOIN w USING (b)
            |GROUP BY doc_id, source
            |ORDER BY dsir_logw DESC, doc_id
            |LIMIT $DsirTopK""".stripMargin)
  )

  /** The md5 CONTRACT companion: the identical DSIR dataflow with
    * md5 bucketing, which DuckDB recomputes end-to-end from the raw
    * documents — the only hash both engines evaluate bit-identically,
    * so this row proves the feature extraction (tokenize → unigrams +
    * bigrams → hash → bucket) matches an independent engine exactly.
    * Runs on the deterministic doc_id % 10 slice: hash parity is a
    * per-feature property (thousands of features hash even in the
    * slice), so full-corpus coverage would buy nothing but md5 cost —
    * the full-corpus arithmetic is q76's own oracle.
    */
  val q76_verify: GraftQuery = GraftQuery(
    "q76_verify",
    (s, dir) =>
      dsirScores(Tables.table(s, dir, "documents").filter(col("doc_id") % 10 === 0),
        col("source").isin(DsirTarget: _*), bucketOf = md5Bucket)
        .orderBy(col("dsir_logw").desc, col("doc_id").asc)
        .limit(DsirTopK),
    Some(s"""WITH docs AS (
            |  SELECT doc_id, source, regexp_extract_all(lower(text), '[a-z]+') AS toks
            |  FROM documents WHERE doc_id % 10 = 0
            |), fx AS (
            |  SELECT doc_id, source,
            |    CAST(('0x' || substr(md5(f), 1, 8)) AS BIGINT) % $DsirBuckets AS b
            |  FROM (
            |    SELECT doc_id, source, unnest(list_concat(toks,
            |      CASE WHEN len(toks) >= 2 THEN
            |        list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])
            |      ELSE CAST([] AS VARCHAR[]) END)) AS f
            |    FROM docs) u
            |), counts AS (
            |  SELECT b, CAST(COUNT(*) AS DOUBLE) AS r_cnt,
            |    CAST(SUM(CASE WHEN source IN (${DsirTarget.map(s => s"'$s'").mkString(", ")}) THEN 1 ELSE 0 END) AS DOUBLE) AS t_cnt
            |  FROM fx GROUP BY b
            |), tot AS (
            |  SELECT SUM(r_cnt) AS rr, SUM(t_cnt) AS tt FROM counts
            |), w AS (
            |  SELECT b, ROUND(
            |    ln((t_cnt + 1.0) / (tt + $DsirBuckets.0)) -
            |    ln((r_cnt + 1.0) / (rr + $DsirBuckets.0)), 6) AS wt
            |  FROM counts CROSS JOIN tot
            |)
            |SELECT doc_id, source,
            |  ROUND(CAST(SUM(CAST(wt AS DECIMAL(20,6))) AS DOUBLE), 6) AS dsir_logw,
            |  CAST(COUNT(*) AS INT) AS n_feats
            |FROM fx JOIN w USING (b)
            |GROUP BY doc_id, source
            |ORDER BY dsir_logw DESC, doc_id
            |LIMIT $DsirTopK""".stripMargin)
  )

  /** Tokens per pseudo-line for q77. The synthetic corpus is
    * single-line text, so "lines" are deterministic width-10 token
    * chunks — the dataflow is exactly what newline-split lines would
    * feed at 100 TB; only the chunker differs.
    */
  private val LineWidth = 10

  /** Width-[[LineWidth]] pseudo-line array of `toks` (each line the
    * space-joined chunk). Guards the empty-doc `sequence(0, -1)`
    * descending trap like [[DsirFeats]].
    */
  private val LinesExpr =
    "if(size(toks) = 0, cast(array() as array<string>), " +
      s"transform(sequence(0, cast(ceil(size(toks) / $LineWidth.0) as int) - 1), " +
      s"i -> array_join(slice(toks, i * $LineWidth + 1, $LineWidth), ' ')))"

  /** Line-level exact dedup (RefinedWeb / MassiveText): every line
    * duplicated ANYWHERE in the corpus survives only at its globally
    * first occurrence (min (doc_id, pos)); docs are rebuilt from their
    * kept lines in order. Complements q67 (rolling token windows,
    * overlap-aware span cutting) with the disjoint line-granular pass
    * real pipelines run first — it is cheaper by the window factor and
    * kills boilerplate (headers, navigation chrome) that repeats as
    * whole lines.
    *
    * Scale shape (the q67 choice, deliberately NOT a window function):
    *   - lines chunk row-locally in the scan stage; the keep-first
    *     winner per line is a packed-bigint `min` keyed by the
    *     line's md5 — a plain MAP-SIDE-COMBINABLE hash aggregate, so a
    *     boilerplate line repeated a billion times collapses to one
    *     row per map task BEFORE the exchange. A `row_number() over
    *     (partition by line)` formulation (the oracle's spelling)
    *     would instead sort the full line stream and hand the
    *     degenerate line's entire partition to one task.
    *   - winners join back to the line stream on the fixed-width md5
    *     key (corpus-sized both sides → shuffle join; AQE splits a
    *     skewed hot line).
    *   - rebuild is one groupBy(doc_id): per-group state is the doc's
    *     own kept lines — bounded by the doc itself, which arrived as
    *     a single row.
    *
    * Determinism: xxhash64 line keys, struct-min tie-free ((doc_id,
    * pos) is unique), rebuilt text pinned by md5 — hash-exact oracle
    * (the
    * oracle's row_number spelling is semantically identical because
    * (doc_id, pos) is unique per line occurrence). Docs with zero kept
    * lines (a full duplicate of an earlier doc) emit NULL kept_md5 on
    * both sides.
    *
    * Fixture: docsWithNearDups — each Z-variant shares every line but
    * its first with its original, so the variant keeps exactly one
    * line; spread=false (q66's reasoning: the first shuffle
    * redistributes the derived line stream anyway).
    */
  /** The line-dedup pass over any (doc_id, text, …) frame:
    * (doc_id, n_lines, n_kept, kept_text) with kept_text the doc
    * rebuilt from its surviving lines (normalized token stream —
    * empty when every line was someone else's). q77 registers the
    * md5 projection; Pipeline.exportCorpus consumes the text itself.
    */
  /** (doc_id, pos) packed into one bigint so the keep-first winner is
    * `min(bigint)` — a plain HASH aggregate. `min(struct(...))` is
    * correct too but Spark plans it as a SortAggregate (struct buffers
    * aren't row-mutable), which sorts every partition of the line
    * stream. Preconditions for the packed order to BE the (doc_id,
    * pos) lexicographic order: doc_id ∈ [0, 2^42) and < 2^21 lines per
    * doc (a 2M-line doc would be a >100 MB single row) — enforced
    * per row by an `assert_true` the optimizer cannot prune
    * (LinkStore.write's validate idiom), so an out-of-contract corpus
    * fails the job loudly instead of silently crowning wrong winners.
    */
  private val LinePosBits = 21

  private[graft] def lineDedupText(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val enc = shiftleft(col("doc_id"), LinePosBits) + col("pos")
    val lines = docs
      .select(col("doc_id"),
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)").as("toks"))
      .select(col("doc_id"), posexplode(expr(LinesExpr)).as(Seq("pos", "line")))
      .filter(assert_true(
        col("doc_id") >= 0 && col("doc_id") < lit(1L << (63 - LinePosBits)) &&
          col("pos") < lit(1 << LinePosBits),
        concat(lit("line-dedup packing contract violated at doc "),
          col("doc_id"), lit(" pos "), col("pos"))).isNull)
      // 8-byte xxhash64 line keys, not 32-char md5 hex: the winner
      // groupBy and the join back both ship (key, enc) — the swap
      // narrows the two widest exchanges ~4× and replaces a crypto
      // hash with a codegen'd one per line. Output-invariant absent
      // collisions (the q66/q29 collision-odds precedent: equal lines
      // collide by construction, distinct lines at ~n²/2⁶⁵ — and the
      // oracle still groups by line CONTENT, so the sf0.01 gate would
      // catch a collision if one ever fired there).
      .select(col("doc_id"), col("pos"), col("line"), xxhash64(col("line")).as("lh"),
        enc.as("enc"))
    // Only DUPLICATED lines need a winner decision — a singleton lh is
    // kept by definition. Filtering the winner frame to cnt > 1 before
    // the join back shrinks it from every-distinct-line to
    // duplicated-lines-only, which AQE then broadcasts when dup
    // density allows (locally: always), removing the wide
    // line-text shuffle the unfiltered inner join forced; at
    // pathological dup density it degrades gracefully to the old
    // shuffle join. LEFT join + null-means-kept keeps semantics
    // bit-identical.
    val winners = lines.groupBy(col("lh"))
      .agg(min(col("enc")).as("w"), count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .select(col("lh"), col("w"))
    lines.join(winners, Seq("lh"), "left")
      .withColumn("kept", (col("w").isNull || col("w") === col("enc")).cast("int"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("int").as("n_lines"),
        sum(col("kept")).cast("int").as("n_kept"),
        collect_list(when(col("kept") === 1, struct(col("pos"), col("line"))))
          .as("kl"))
      .select(col("doc_id"), col("n_lines"), col("n_kept"),
        concat_ws(" ", expr("transform(array_sort(kl), x -> x.line)"))
          .as("kept_text"))
  }

  val q77_line_dedup: GraftQuery = GraftQuery(
    "q77_line_dedup",
    (s, dir) =>
      lineDedupText(Tables.docsWithNearDups(s, dir, spread = false))
        .select(col("doc_id"), col("n_lines"), col("n_kept"),
          when(col("n_kept") > 0, md5(col("kept_text"))).as("kept_md5")),
    Some(Tables.docsNearDupsCte +
      s""", toks AS (
         |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ts FROM alldocs
         |), lines AS (
         |  SELECT doc_id, pos,
         |    array_to_string(ts[(pos * $LineWidth + 1):(pos * $LineWidth + $LineWidth)], ' ') AS line
         |  FROM (
         |    SELECT doc_id, ts,
         |      unnest(range(0, CAST(ceil(len(ts) / $LineWidth.0) AS INT))) AS pos
         |    FROM toks) x
         |), ranked AS (
         |  SELECT doc_id, pos, line,
         |    row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
         |  FROM lines
         |)
         |SELECT doc_id, CAST(COUNT(*) AS INT) AS n_lines,
         |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS INT) AS n_kept,
         |  md5(string_agg(CASE WHEN rn = 1 THEN line END, ' ' ORDER BY pos)) AS kept_md5
         |FROM ranked GROUP BY doc_id""".stripMargin)
  )

  /** A source's template line counts as boilerplate only when the
    * source has enough docs for "majority" to mean anything — below
    * this, nothing is stripped (a 2-doc host sharing a line is
    * coincidence, not chrome). Every SF's fixture has ≥ 25 docs per
    * source, so the planted header is always over the bar.
    */
  private val BoilerMinDocs = 5

  /** Host-level boilerplate-line removal (the RefinedWeb/CCNet pass
    * that runs BEFORE q77's global line dedup): a line appearing in a
    * strict majority of a host's documents is site chrome (navigation,
    * footers, cookie banners), and every occurrence of it is stripped
    * from that host's docs. Differs from q77 on both axes: the key is
    * (host, line) not (line), and a boilerplate line survives NOWHERE
    * (q77 keeps the globally-first occurrence).
    *
    * Scale shape:
    *   - lines chunk row-locally in the scan stage (shared
    *     [[LinesExpr]]); the per-(source, line) document frequency is
    *     `distinct` + a count aggregate — both hash aggregates on the
    *     same (source, lh) key prefix, map-side combined, so a line
    *     repeated a million times in ONE doc collapses before either
    *     exchange.
    *   - per-source doc totals are a broadcast-size frame (one row per
    *     host).
    *   - the boilerplate table is O(hosts × template-lines) — tiny
    *     relative to the corpus but NOT provably broadcast-size at
    *     crawl scale, so the join back is left un-hinted: AQE converts
    *     it to broadcast at runtime when the built side is actually
    *     small (locally it always is), and falls back to a shuffle
    *     join on the fixed-width (source, lh) key beyond.
    *   - rebuild is q77's: one groupBy(doc_id), per-group state
    *     bounded by the doc itself.
    *
    * Thresholds compare as integers (`2·d > n_docs`) — no float
    * boundary to round apart cross-engine; md5 line keys, rebuilt text
    * pinned by md5 → hash-exact oracle.
    *
    * Reference analogue: none (the reference ingests link metadata,
    * not page text); pure training-data-pipeline surface like q77.
    */
  private[graft] def boilerplateStrip(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val lines = docs
      .select(col("doc_id"), col("source"),
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)").as("toks"))
      .select(col("doc_id"), col("source"),
        posexplode(expr(LinesExpr)).as(Seq("pos", "line")))
      .withColumn("lh", md5(col("line")))
    val srcDocs = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val boiler = lines.select(col("source"), col("lh"), col("doc_id")).distinct()
      .groupBy(col("source"), col("lh"))
      .agg(count(lit(1)).as("d"))
      .join(broadcast(srcDocs), "source")
      .filter(col("n_docs") >= BoilerMinDocs && col("d") * 2 > col("n_docs"))
      .select(col("source"), col("lh"), lit(1).as("is_boiler"))
    lines.join(boiler, Seq("source", "lh"), "left")
      .withColumn("kept", col("is_boiler").isNull.cast("int"))
      .groupBy(col("doc_id"), col("source"))
      .agg(
        count(lit(1)).cast("int").as("n_lines"),
        sum(col("kept")).cast("int").as("n_kept"),
        collect_list(when(col("kept") === 1, struct(col("pos"), col("line"))))
          .as("kl"))
      .select(col("doc_id"), col("source"), col("n_lines"), col("n_kept"),
        concat_ws(" ", expr("transform(array_sort(kl), x -> x.line)"))
          .as("kept_text"))
  }

  val q80_boilerplate: GraftQuery = GraftQuery(
    "q80_boilerplate",
    (s, dir) =>
      boilerplateStrip(Tables.docsWithBoilerplate(s, dir))
        .select(col("doc_id"), col("source"), col("n_lines"), col("n_kept"),
          when(col("n_kept") > 0, md5(col("kept_text"))).as("kept_md5")),
    Some(Tables.docsBoilerplateCte +
      s""", toks AS (
         |  SELECT doc_id, source, regexp_extract_all(lower(text), '[a-z]+') AS ts FROM alldocs
         |), lines AS (
         |  SELECT doc_id, source, pos,
         |    array_to_string(ts[(pos * $LineWidth + 1):(pos * $LineWidth + $LineWidth)], ' ') AS line
         |  FROM (
         |    SELECT doc_id, source, ts,
         |      unnest(range(0, CAST(ceil(len(ts) / $LineWidth.0) AS INT))) AS pos
         |    FROM toks) x
         |), srcdocs AS (
         |  SELECT source, COUNT(*) AS n_docs FROM alldocs GROUP BY source
         |), boiler AS (
         |  SELECT source, line FROM (
         |    SELECT source, line, COUNT(DISTINCT doc_id) AS d
         |    FROM lines GROUP BY source, line) f
         |  JOIN srcdocs USING (source)
         |  WHERE n_docs >= $BoilerMinDocs AND d * 2 > n_docs
         |), flagged AS (
         |  SELECT l.doc_id, l.source, l.pos, l.line,
         |    CASE WHEN b.line IS NULL THEN 1 ELSE 0 END AS kept
         |  FROM lines l LEFT JOIN boiler b ON l.source = b.source AND l.line = b.line
         |)
         |SELECT doc_id, source, CAST(COUNT(*) AS INT) AS n_lines,
         |  CAST(SUM(kept) AS INT) AS n_kept,
         |  md5(string_agg(CASE WHEN kept = 1 THEN line END, ' ' ORDER BY pos)) AS kept_md5
         |FROM flagged GROUP BY doc_id, source""".stripMargin)
  )

  val all: Seq[GraftQuery] = Seq(q76_dsir, q76_verify, q77_line_dedup, q80_boilerplate)
}
