package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._

/** Scale-technique operators: explicit skew mitigation and sketch
  * aggregates. These exist to keep the 100 TB posture honest — the
  * techniques are exercised (and oracle-checked where exact) at test
  * scale so they're ready when a key is hot or an exact distinct is
  * unaffordable.
  */
object ScaleOps {

  private val SaltBuckets = 16

  /** Salted shuffle join for skewed keys. `link_domain` is Zipfian (a
    * few domains dominate); a plain shuffle join puts each hot key in
    * ONE reducer task. Salting fans the fact side into `SaltBuckets`
    * sub-keys and replicates the dim side across them, so a hot key
    * occupies 16 tasks instead of 1. AQE's skew-join split handles
    * mid-size skew automatically; explicit salting is the deterministic
    * fallback for pathological keys (and composes with any join type).
    * The shuffle_hash hint forces the exchange so the pattern is
    * actually exercised (Catalyst would otherwise broadcast this tiny
    * dim — at 100 TB a per-domain dim may be far beyond broadcast
    * range).
    *
    * The oracle is the UNSALTED join: salting must be semantically
    * invisible, and the hash-exact compare proves it.
    */
  val q37_salted_join: GraftQuery = GraftQuery(
    "q37_salted_join",
    (s, dir) => {
      val links = Tables.links(s, dir)
      val dim = links.select(col("link_domain")).distinct()
        .withColumn("domain_weight", length(col("link_domain")).cast("bigint"))
      val saltedFact = links.withColumn("salt", pmod(col("src_key"), lit(SaltBuckets)))
      val saltedDim = dim.withColumn("salt",
        explode(sequence(lit(0), lit(SaltBuckets - 1)))) // replicate dim per salt
      saltedFact
        .join(saltedDim.hint("shuffle_hash"), Seq("link_domain", "salt"))
        .groupBy(col("link_domain"))
        .agg(
          sum(col("qty") * col("domain_weight")).cast("bigint").as("weighted_qty"),
          count(lit(1)).as("n_links"))
    },
    Some(Tables.linksCte +
      """SELECT l.link_domain,
        |  CAST(SUM(l.qty * length(l.link_domain)) AS BIGINT) AS weighted_qty,
        |  COUNT(*) AS n_links
        |FROM links l
        |GROUP BY l.link_domain""".stripMargin)
  )

  /** Sketch aggregates for 100 TB cardinality/quantile questions:
    * HyperLogLog++ distinct counts and approximate percentiles, next
    * to their exact counterparts — WITH the sketch error bounds
    * checked inside the query as integer columns, which is what flips
    * q38 to a full oracle (r10 verdict item 5): the sketch VALUES are
    * engine-specific (DuckDB has no HLL++/GK parity), but the CONTRACT
    * "the sketch landed within its published bound of the exact
    * answer" is a cross-engine-checkable integer — the oracle emits
    * the literal 1s and independently recomputes every exact column,
    * so a sketch drifting out of bounds (or an exact aggregate
    * diverging) turns the driver gate red.
    *
    * Bounds checked:
    *   - `hll_ok`: |approx − exact| ≤ max(6% of exact, 10) — 3σ of the
    *     configured rsd=0.02 plus an absolute floor for tiny groups
    *     (HLL++ is near-exact in sparse mode).
    *   - `p50_ok`/`p95_ok`: the approximate percentile's ACTUAL rank
    *     (|{value ≤ approx}|, counted in a second pass with the
    *     5-row sketch frame broadcast back onto events) is within
    *     0.001·n + 2 of p·n — ten times the GK sketch's rank-error
    *     guarantee (default accuracy 10⁴ → ε = 10⁻⁴) plus an
    *     absolute slack of 2 for tiny groups, stated in rank space
    *     where the guarantee actually lives (a value-space band via
    *     exact interpolated percentiles breaks when the band is
    *     narrower than element spacing — measured at sf0.001's
    *     ~200-row groups).
    *
    * The exact counterparts inside this query exist to CHECK the
    * sketches, not to replace them — at 100 TB production runs the
    * sketch columns alone; this query is the standing evidence that
    * they can be trusted.
    */
  val q38_approx_stats: GraftQuery = GraftQuery(
    "q38_approx_stats",
    (s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .select(col("event_type"), col("user_id"), col("value"))
      val sketch = ev.groupBy(col("event_type"))
        .agg(
          approx_count_distinct(col("user_id"), rsd = 0.02).as("au"),
          countDistinct(col("user_id")).as("exact_users"),
          expr("approx_percentile(value, 0.5)").as("p50"),
          expr("approx_percentile(value, 0.95)").as("p95"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"),
          count(lit(1)).as("n_events"))
      // second pass: the approx percentiles' ACTUAL ranks — the
      // one-row-per-group sketch frame broadcasts back onto events
      // (at 100 TB this is a per-group-constant broadcast, not a
      // data-sized join)
      ev.join(broadcast(sketch), "event_type")
        .groupBy(col("event_type"))
        .agg(
          first(col("exact_users")).as("exact_users"),
          first(col("min_value")).as("min_value"),
          first(col("max_value")).as("max_value"),
          first(col("n_events")).as("n_events"),
          first(col("au")).as("au"),
          // tie-adjusted rank interval: the GK guarantee is on RANK
          // POSITION, and a value with multiplicity m occupies ranks
          // [strictly-below+1, <=-count] — gating on the <=-count alone
          // overshoots by m-1 on heavy ties and would flip a CORRECT
          // sketch red. The gate asks whether the target rank p*n can
          // fall inside the value's occupied interval, widened by the
          // epsilon slack on each side.
          sum(when(col("value") <= col("p50"), 1L).otherwise(0L)).as("r50"),
          sum(when(col("value") < col("p50"), 1L).otherwise(0L)).as("r50lo"),
          sum(when(col("value") <= col("p95"), 1L).otherwise(0L)).as("r95"),
          sum(when(col("value") < col("p95"), 1L).otherwise(0L)).as("r95lo"))
        .select(
          col("event_type"),
          col("exact_users"),
          col("min_value"),
          col("max_value"),
          col("n_events"),
          (abs(col("au") - col("exact_users")) <=
            greatest(ceil(col("exact_users") * lit(0.06)).cast("bigint"), lit(10L)))
            .cast("int").as("hll_ok"),
          ((lit(0.5) * col("n_events") <=
              col("r50").cast("double") + lit(0.001) * col("n_events") + lit(2.0)) &&
            (lit(0.5) * col("n_events") >=
              col("r50lo").cast("double") + 1.0 - (lit(0.001) * col("n_events") + lit(2.0))))
            .cast("int").as("p50_ok"),
          ((lit(0.95) * col("n_events") <=
              col("r95").cast("double") + lit(0.001) * col("n_events") + lit(2.0)) &&
            (lit(0.95) * col("n_events") >=
              col("r95lo").cast("double") + 1.0 - (lit(0.001) * col("n_events") + lit(2.0))))
            .cast("int").as("p95_ok"))
    },
    Some("""SELECT event_type,
           |  COUNT(DISTINCT user_id) AS exact_users,
           |  MIN(value) AS min_value,
           |  MAX(value) AS max_value,
           |  COUNT(*) AS n_events,
           |  CAST(1 AS INTEGER) AS hll_ok,
           |  CAST(1 AS INTEGER) AS p50_ok,
           |  CAST(1 AS INTEGER) AS p95_ok
           |FROM events GROUP BY event_type""".stripMargin)
  )

  /** Top-k per group through the CUSTOM physical operator
    * (graft.plans.TopKPerGroup: bounded heaps + partial/final split)
    * instead of a window sort — the oracle is the row_number
    * formulation, so the hash-exact compare proves the operator
    * implements identical semantics with a fraction of the shuffle.
    */
  val q39_topk_per_group: GraftQuery = GraftQuery(
    "q39_topk_per_group",
    (s, dir) => {
      val o = Tables.table(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      graft.plans.TopKPerGroup(o,
        Seq(col("o_custkey")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM (
           |  SELECT o_custkey, o_orderkey, o_totalprice,
           |    ROW_NUMBER() OVER (PARTITION BY o_custkey
           |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
           |  FROM orders) t WHERE rk <= 3""".stripMargin)
  )

  /** As-of join — Spark has no native operator for "each left row picks
    * the latest right row at or before its time". The naive inequality
    * join is a quadratic range join; the scalable formulation is the
    * union + running-window trick: tag both sides, sort each key's
    * timeline once (orders before events at equal dates so same-day
    * orders apply), and carry the latest order date forward with a
    * running max — ONE shuffle on the join key, linear work.
    * Oracle: DuckDB's NATIVE `ASOF LEFT JOIN`, so the hash-exact
    * compare certifies the rewrite against an independent
    * first-class implementation. Output aggregates at date
    * granularity (tie-ambiguous row identity never surfaces).
    */
  val q42_asof_join: GraftQuery = GraftQuery(
    "q42_asof_join",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.table(s, dir, "events")
        .select(pmod(col("user_id"), lit(1500)).as("cust"),
          to_date(col("ts")).as("d"), lit(1).as("kind"), col("event_type"))
      val ord = Tables.table(s, dir, "orders")
        // drop null-key orders: SQL join equality (the oracle's ASOF ON)
        // never matches NULL, but Window.partitionBy groups NULLs
        // together — a null-cust order would wrongly "match" null-cust
        // events. Null-cust EVENTS stay and correctly carry no order.
        .filter(col("o_custkey").isNotNull)
        .select(col("o_custkey").as("cust"), col("o_orderdate").cast("date").as("d"),
          lit(0).as("kind"), lit(null).cast("string").as("event_type"))
      val w = Window.partitionBy(col("cust"))
        .orderBy(col("d").asc, col("kind").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ord.unionAll(ev)
        .withColumn("last_order_d", max(when(col("kind") === 0, col("d"))).over(w))
        .filter(col("kind") === 1)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          count(col("last_order_d")).as("n_matched"),
          sum(datediff(col("d"), col("last_order_d"))).cast("bigint").as("total_gap_days"))
    },
    Some("""WITH e AS (
           |  SELECT event_type, user_id % 1500 AS cust,
           |         CAST(CAST(ts AS TIMESTAMP) AS DATE) AS edate
           |  FROM events),
           |o AS (SELECT o_custkey AS cust, CAST(o_orderdate AS DATE) AS odate FROM orders),
           |j AS (
           |  SELECT e.event_type, e.edate, o.odate
           |  FROM e ASOF LEFT JOIN o
           |    ON e.cust = o.cust AND e.edate >= o.odate)
           |SELECT event_type, COUNT(*) AS n_events,
           |  COUNT(odate) AS n_matched,
           |  CAST(SUM(datediff('day', odate, edate)) AS BIGINT) AS total_gap_days
           |FROM j GROUP BY event_type""".stripMargin)
  )

  /** Range (interval) join via bucketing. Joining events into order
    * validity windows with a raw `BETWEEN` predicate gives Spark a
    * BroadcastNestedLoop/cartesian plan — quadratic at scale. The
    * scalable shape: explode each 30-day interval into the ~5 weekly
    * buckets it covers, map each event to its week, equi-join on
    * (cust, week) — shuffle-hash-joinable, linear in matches — then
    * apply the exact BETWEEN as a post-filter. The oracle is the naive
    * inequality join in DuckDB, so the hash-exact compare proves the
    * bucketing is lossless. Event dates derive deterministically from
    * event_id so both engines see the same 1995-era timeline.
    */
  val q43_range_join: GraftQuery = GraftQuery(
    "q43_range_join",
    (s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .select(pmod(col("user_id"), lit(1500)).as("cust"), col("event_type"),
          col("event_id"),
          pmod(col("event_id"), lit(1000)).cast("int").as("eday"))
        .withColumn("ewk", (col("eday") / 7).cast("int"))
      val ord = Tables.table(s, dir, "orders")
        .select(col("o_custkey").as("cust"), col("o_orderkey"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("sday"))
        .withColumn("eday_end", col("sday") + 29)
        .withColumn("wk", explode(expr(
          "sequence(cast(floor(sday / 7) as int), cast(floor((sday + 29) / 7) as int))")))
      // Two-level rollup instead of count + countDistinct + sum in one
      // agg: mixing distinct and non-distinct aggregates makes Catalyst
      // Expand the pair stream (×2–3 rows) and track a distinct hash per
      // group. Pre-aggregating per (event_type, event_id) is map-side
      // combinable on the pair stream; the distinct-event count is then
      // a plain row count of the (much smaller) per-event frame, and the
      // final rollup moves one row per matched event, not per pair.
      // shuffle_hash hint ON THE EVENTS SIDE: Catalyst's size estimate
      // does not account for the 5× explode, so unhinted it BROADCASTS
      // the exploded orders side — a multi-million-row hashed relation
      // built on the driver (measured: ~6s of the query's 6s at sf1,
      // and a driver OOM at cluster scale). Neither side of an
      // interval join is broadcastable at 100 TB, so it must be a
      // shuffle join — and the build side matters because a shuffled
      // hash join CANNOT SPILL its build: hinting the exploded side
      // OOMs at sf10 ("not enough memory to build hash map", 77M
      // exploded rows), while the events side is the pre-explode
      // frame, 5-8× smaller by construction — per-partition builds
      // stay bounded as shuffle partitions scale with the cluster.
      // (Sort-merge survives too but measured ~1.5× slower at sf10;
      // the explode-side growth factor is a plan-time constant, so
      // "build on the non-exploded side" is a stable rule, not a
      // fixture artifact.)
      ev.hint("shuffle_hash").join(ord.withColumnRenamed("wk", "ewk"), Seq("cust", "ewk"))
        .filter(col("eday").between(col("sday"), col("eday_end")))
        .groupBy(col("event_type"), col("event_id"))
        .agg(
          count(lit(1)).as("pairs_e"),
          sum(col("eday") - col("sday")).as("off_e"))
        .groupBy(col("event_type"))
        .agg(
          sum(col("pairs_e")).as("n_pairs"),
          count(lit(1)).as("n_events_matched"),
          sum(col("off_e")).cast("bigint").as("total_offset_days"))
    },
    Some("""WITH e AS (
           |  SELECT user_id % 1500 AS cust, event_type, event_id,
           |         CAST(event_id % 1000 AS INTEGER) AS eday
           |  FROM events),
           |o AS (
           |  SELECT o_custkey AS cust, o_orderkey,
           |         datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS sday
           |  FROM orders)
           |SELECT event_type, COUNT(*) AS n_pairs,
           |  COUNT(DISTINCT event_id) AS n_events_matched,
           |  CAST(SUM(eday - sday) AS BIGINT) AS total_offset_days
           |FROM e JOIN o
           |  ON e.cust = o.cust AND e.eday BETWEEN o.sday AND o.sday + 29
           |GROUP BY event_type""".stripMargin)
  )

  val all: Seq[GraftQuery] = Seq(
    q37_salted_join, q38_approx_stats, q39_topk_per_group, q42_asof_join,
    q43_range_join)
}
